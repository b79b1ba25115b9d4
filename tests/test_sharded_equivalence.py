"""Data-parallel contract: an 8-device sharded training step must produce the
SAME parameters as a single-device step on the same global batch.

This is the reference's DDP semantics — "same model as single-GPU, gradients
averaged across replicas" (/root/reference/command_handlers/train_or_resume.py:105-106)
— realized here by GSPMD: the batch is sharded over the 'data' mesh axis,
parameters are replicated, and jit inserts the gradient all-reduce.  Because
batch-stat reductions under jit are over the GLOBAL logical batch (not
per-shard), even unfrozen BatchNorm must match up to float reassociation
(the all-reduce sums in a different order than a single device does, and
the difference compounds over steps) — we check both the frozen and the
training-BN case at tolerances far below any semantic divergence (a missing
grad-mean or per-shard BN would be ~1e-1, not ~1e-3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.parallel import make_mesh, replicate, shard_batch
from dualsuperreslearningforsemseg_tpu.train import sgd_init, make_train_step, TrainState

IN_HW = (32, 64)
OUT_HW = (64, 128)
N_STEPS = 3


def _run(devices, batch, rng_seed=7, freeze_bn=True):
    model = DSRL(stage=3, num_classes=cs.NUM_CLASSES)
    mesh = make_mesh(devices)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, *IN_HW, 3), jnp.float32), False)
    state = TrainState(params=replicate(variables['params'], mesh),
                       batch_stats=replicate(variables['batch_stats'], mesh),
                       momentum=replicate(sgd_init(variables['params']), mesh))
    train_step = make_train_step(model, stage=3, w1=0.1, w2=1.0, momentum=0.9,
                                 weight_decay=0.0005,
                                 ignore_label=cs.IGNORE_CLASS_LABEL,
                                 freeze_batch_norm=freeze_bn, mesh=mesh)
    img_lo, img_hi, seg = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(rng_seed)
    losses = None
    for _ in range(N_STEPS):
        key, step_key = jax.random.split(key)
        state, losses = train_step(state, img_lo, img_hi, seg,
                                   jnp.float32(0.01), step_key)
    return (jax.device_get(state.params), jax.device_get(state.batch_stats),
            {k: float(v) for k, v in losses.items()})


def _global_batch(rng):
    img_lo = jnp.asarray(rng.standard_normal((8, *IN_HW, 3)).astype(np.float32))
    img_hi = jnp.asarray(rng.standard_normal((8, *OUT_HW, 3)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, cs.NUM_CLASSES, size=(8, *OUT_HW)).astype(np.int32))
    return img_lo, img_hi, seg


@pytest.mark.parametrize('freeze_bn', [True, False],
                         ids=['frozen-bn', 'training-bn'])
def test_8dev_step_equals_1dev_step(rng, freeze_bn):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide the virtual 8-CPU mesh"
    batch = _global_batch(rng)
    # Training-mode BN uses single-pass E[x^2]-mean^2 statistics whose
    # cancellation error differs more between reduction orders; still two
    # orders of magnitude under any semantic divergence.
    atol = 1e-4 if freeze_bn else 1e-3

    params_8, stats_8, losses_8 = _run(devices[:8], batch, freeze_bn=freeze_bn)
    params_1, stats_1, losses_1 = _run(devices[:1], batch, freeze_bn=freeze_bn)

    for k in losses_1:
        np.testing.assert_allclose(losses_8[k], losses_1[k], rtol=3e-3, atol=atol,
                                   err_msg="loss '{}' diverged".format(k))

    flat_8 = jax.tree_util.tree_leaves_with_path(params_8)
    flat_1 = dict(jax.tree_util.tree_leaves_with_path(params_1))
    assert len(flat_8) == len(flat_1)
    for path, leaf_8 in flat_8:
        np.testing.assert_allclose(
            np.asarray(leaf_8), np.asarray(flat_1[path]), rtol=3e-3, atol=atol,
            err_msg="params diverged after {} sharded steps at {}".format(
                N_STEPS, jax.tree_util.keystr(path)))

    stats_8_flat = jax.tree_util.tree_leaves_with_path(stats_8)
    stats_1_flat = dict(jax.tree_util.tree_leaves_with_path(stats_1))
    for path, leaf_8 in stats_8_flat:
        np.testing.assert_allclose(
            np.asarray(leaf_8), np.asarray(stats_1_flat[path]), rtol=3e-3, atol=atol,
            err_msg="batch stats diverged at {}".format(jax.tree_util.keystr(path)))
