"""GSPMD collective-set regression test (VERDICT r3 #5).

Compiles the production stage-3 train step on the 8-device mesh and pins
the collective operations in the optimized HLO.  Guards the perf story
against silent partitioner regressions: an accidental resharding shows up
as all-gathers on a pure data mesh (where the only communication the DDP
contract needs is gradient/loss all-reduce,
/root/reference/command_handlers/train_or_resume.py:105-106), and the
spatial mesh must communicate through halo collective-permutes, never
all-to-alls.

Counts are asserted as invariants, not exact numbers: XLA's combiner
merges gradient all-reduces into variadic tuple-result groups (the CPU
backend currently folds the ~102 param leaves into ~51 combined
all-reduces), so the data-mesh bound is "at most one per parameter leaf
plus a scalar handful", which still catches any per-activation reduction
sneaking in (those scale with the layer count x batch, not the leaf count).
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
from dualsuperreslearningforsemseg_tpu.models import DSRL, init_model_host
from dualsuperreslearningforsemseg_tpu.parallel import (make_mesh, replicate,
                                                        batch_sharding)
from dualsuperreslearningforsemseg_tpu.train import (sgd_init, make_train_step,
                                                     TrainState)

_OPS = ('all-reduce', 'all-reduce-start', 'all-gather', 'collective-permute',
        'all-to-all', 'reduce-scatter')


def _compiled_collectives(monkeypatch, spatial, fused_tail):
    # The packed-state wrapper manages its own persistent buffers; lower the
    # plain jit boundary instead (identical model/loss/update HLO — packing
    # only narrows the program boundary, train/packing.py).
    monkeypatch.setenv('DSRL_TPU_PACK_SMALL', '0')
    model = DSRL(stage=3, num_classes=cs.NUM_CLASSES)
    variables = init_model_host(model, (64, 128))
    rng = np.random.default_rng(0)
    mesh = make_mesh(jax.devices()[:8], spatial=spatial)
    state = TrainState(params=replicate(variables['params'], mesh),
                       batch_stats=replicate(variables['batch_stats'], mesh),
                       momentum=replicate(sgd_init(variables['params']), mesh))
    step = make_train_step(model, stage=3, w1=0.1, w2=1.0, momentum=0.9,
                           weight_decay=5e-4, mesh=mesh, fused_tail=fused_tail)
    img_lo = jax.device_put(rng.standard_normal((8, 64, 128, 3), dtype=np.float32),
                            batch_sharding(mesh, 4))
    img_hi = jax.device_put(rng.standard_normal((8, 128, 256, 3), dtype=np.float32),
                            batch_sharding(mesh, 4))
    seg = jax.device_put(rng.integers(0, 19, size=(8, 128, 256)).astype(np.int32),
                         batch_sharding(mesh, 3))
    txt = step.lower(state, img_lo, img_hi, seg, jnp.float32(0.001),
                     jax.random.PRNGKey(7)).compile().as_text()
    # Count the op CALLS ("... = <ty> op(..."), where <ty> may be a
    # multi-token tuple type for combined/variadic collectives — a "= \S+ op("
    # pattern silently misses every tuple-result instruction.  The name
    # reference sites ("%all-reduce.5") never carry a following paren and the
    # leading %/word guard keeps ops from matching inside longer op names
    # ("all-reduce-done(", "ragged-all-to-all(").
    counts = {op: len(re.findall(r'(?<![\w%-]){}\('.format(op), txt))
              for op in _OPS}
    n_leaves = len(jax.tree_util.tree_leaves(variables['params']))
    return counts, n_leaves


def test_data_mesh_collectives_are_allreduce_only(monkeypatch):
    counts, n_leaves = _compiled_collectives(monkeypatch, spatial=1,
                                             fused_tail=True)
    n_ar = counts['all-reduce'] + counts['all-reduce-start']
    assert n_ar > 0, counts
    # XLA's combiner merges the grad + BN-moment + scalar reductions into
    # variadic tuple all-reduces: measured 51 groups for the 102 param
    # leaves on this backend.  The invariant worth pinning is "scales with
    # the LEAF count, not the activation count" — a partitioner regression
    # that reduces activations per layer per batch element would blow well
    # past one-per-leaf.
    assert n_ar <= n_leaves + 16, (n_ar, n_leaves, counts)
    assert counts['all-gather'] == 0, counts        # no accidental resharding
    assert counts['collective-permute'] == 0, counts
    assert counts['all-to-all'] == 0, counts


def test_spatial_mesh_has_halo_exchanges(monkeypatch):
    counts, n_leaves = _compiled_collectives(monkeypatch, spatial=2,
                                             fused_tail=False)
    n_ar = counts['all-reduce'] + counts['all-reduce-start']
    assert n_ar > 0, counts
    # halo exchanges for the H-sharded decoder convs (fwd + bwd)
    assert counts['collective-permute'] > 0, counts
    assert counts['all-to-all'] == 0, counts
    # The trunk(H-replicated) <-> decoder(H-sharded) boundary legitimately
    # all-gathers in the backward; anything beyond a small fixed set means
    # the partitioner started resharding activations wholesale (measured
    # baseline: 3 on the 4x2 mesh with the definition-counting regex).
    assert counts['all-gather'] <= 12, counts