"""Depth-complete torch parity (VERDICT r3 #1a).

Two gaps the shallow ``test_full_model_parity`` (LAYERS=(1,1,2,1)) cannot
catch:

* depth-dependent wiring bugs in ``ResNet101._make_layer`` — e.g. an
  off-by-one threading inplanes/stride/dilation across layer3's 23 blocks
  (/root/reference/models/modules/backbone/ResNet101.py:13-14,67-89) —
  covered by an eval-mode parity check of the PRODUCTION depth (3,4,23,3)
  at the production 256x512 input (env-gated: slow on CPU);
* train-dynamics bugs (BN batch-stat updates, SGD+weight-decay+momentum
  integration) that eval-mode checks never execute — covered by a 3-step
  training parity run at mid depth with dropout disabled on both sides
  (torch keeps its Dropout modules in eval; ours swaps FastDropout for an
  identity module — dropout owns no parameters, so the trees are unchanged).

Run the full-depth check with ``DSRL_TPU_TESTS_FULL_DEPTH=1 python -m
pytest tests/test_full_depth_parity.py -q`` (~minutes; the plain suite
skips it, like the TPU-gated kernels suites).
"""

import os

import numpy as np
import pytest
import torch as t
import jax
import jax.numpy as jnp
import flax.linen as nn

from dualsuperreslearningforsemseg_tpu.models import DSRL, state_dict
from dualsuperreslearningforsemseg_tpu.models.state_dict import flatten_variables
from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss
from dualsuperreslearningforsemseg_tpu.train.optim import sgd_init, sgd_update
from tests.test_full_model_parity import TorchDSRL, _PREFIX_MAP

PRODUCTION_LAYERS = (3, 4, 23, 3)
MID_LAYERS = (2, 2, 4, 2)


def _perturb_batch_stats(tree, rng):
    """Give BN running stats non-trivial values in place so parity runs
    normalize with real constants rather than the (0, 1) init — shared by
    the eval and train-dynamics suites so both pin the SAME statistics."""
    for k, v in tree.items():
        if isinstance(v, dict):
            _perturb_batch_stats(v, rng)
        elif k == 'running_mean':
            tree[k] = jnp.asarray(rng.standard_normal(v.shape, dtype=np.float32) * 0.05)
        elif k == 'running_var':
            tree[k] = jnp.asarray(1.0 + 0.2 * rng.random(v.shape).astype(np.float32))



def _to_torch_replica(variables, ref, allow_missing=()):
    """``allow_missing``: replica module prefixes our stage-gated model does
    not build (the replica always builds all branches)."""
    sd = state_dict(variables)
    tsd = {}
    for key, value in sd.items():
        if key.endswith('num_batches_tracked'):
            continue
        for src, dst in _PREFIX_MAP:
            if key.startswith(src):
                tsd[dst + key[len(src):]] = t.from_numpy(np.ascontiguousarray(value))
                break
        else:
            raise AssertionError('unmapped key ' + key)
    missing, unexpected = ref.load_state_dict(tsd, strict=False)
    real_missing = [m for m in missing if 'num_batches' not in m
                    and not m.startswith(tuple(allow_missing) or ('\0',))]
    assert not real_missing, real_missing
    assert not unexpected, unexpected


@pytest.mark.skipif(not os.environ.get('DSRL_TPU_TESTS_FULL_DEPTH'),
                    reason='full-depth (3,4,23,3) parity: set '
                           'DSRL_TPU_TESTS_FULL_DEPTH=1 (slow on CPU)')
def test_full_depth_eval_parity(rng):
    """(3,4,23,3) stage-3 eval parity at the production 256x512 input."""
    model = DSRL(stage=3, num_classes=19, backbone_layers=PRODUCTION_LAYERS)
    x = rng.standard_normal((1, 256, 512, 3), dtype=np.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.asarray(x), False)

    _perturb_batch_stats(variables['batch_stats'], rng)

    ours = model.apply(variables, jnp.asarray(x), False)

    ref = TorchDSRL(layers=PRODUCTION_LAYERS).eval()
    _to_torch_replica(variables, ref)
    with t.no_grad():
        theirs = ref(t.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    for name, o, th in zip(['SSSR', 'SISR', 'SSSR_T', 'SISR_T'], ours, theirs):
        o = np.asarray(o)
        th = np.transpose(th.numpy(), (0, 2, 3, 1))
        assert o.shape == th.shape, (name, o.shape, th.shape)
        np.testing.assert_allclose(o, th, rtol=1e-3, atol=2e-3, err_msg=name)


class _IdentityDropout(nn.Module):
    """Dropout stand-in for train-dynamics parity: same call signature, no
    parameters, no rng draw — torch's ``Dropout.eval()`` twin."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic, pad_lanes=0):
        return x


def _run_parity_steps(rng, monkeypatch, freeze_bn):
    """3 real SGD steps ours-vs-torch at MID_LAYERS; returns everything the
    assertions need.  ``freeze_bn``: reference ``--freeze-batch-norm``
    semantics (BN modules eval during training,
    /root/reference/command_handlers/train_or_resume.py:379-382)."""
    from dualsuperreslearningforsemseg_tpu.models import dsrl as dsrl_mod
    monkeypatch.setattr(dsrl_mod, 'FastDropout', _IdentityDropout)

    lr, momentum, wd = 0.01, 0.9, 5e-4
    model = DSRL(stage=1, num_classes=19, backbone_layers=MID_LAYERS)
    x0 = rng.standard_normal((2, 64, 128, 3), dtype=np.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.asarray(x0), False)
    # Non-trivial running stats so the frozen path normalizes with real
    # constants rather than the (0, 1) init.
    _perturb_batch_stats(variables['batch_stats'], rng)
    params0 = jax.tree_util.tree_map(np.asarray, variables['params'])
    bstats0 = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    ref = TorchDSRL(stage=1, layers=MID_LAYERS)
    _to_torch_replica(variables, ref,
                      allow_missing=('sisr.', 'sssr_ft.', 'sisr_ft.'))
    ref.train()
    for m in ref.modules():
        if isinstance(m, t.nn.Dropout) or (freeze_bn and isinstance(m, t.nn.BatchNorm2d)):
            m.eval()
    opt = t.optim.SGD(ref.parameters(), lr=lr, momentum=momentum, weight_decay=wd)

    steps = [(rng.standard_normal((2, 64, 128, 3), dtype=np.float32),
              rng.integers(0, 19, size=(2, 128, 256)).astype(np.int32))
             for _ in range(3)]
    # sprinkle ignore labels so the masked CE path is exercised
    for _, seg in steps:
        seg[:, :4, :4] = 255

    def loss_fn(params, batch_stats, x, seg):
        outs, new_vars = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            jnp.asarray(x), True, freeze_bn, mutable=['batch_stats'])
        return (cross_entropy_loss(outs[0], jnp.asarray(seg), 255),
                new_vars['batch_stats'])

    params, bstats = variables['params'], variables['batch_stats']
    mom_buf = sgd_init(params)
    our_losses, torch_losses = [], []
    for x, seg in steps:
        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bstats, x, seg)
        params, mom_buf = sgd_update(params, grads, mom_buf, lr, momentum, wd)
        our_losses.append(float(loss))

        logits = ref(t.from_numpy(np.transpose(x, (0, 3, 1, 2))))[0]
        tl = t.nn.CrossEntropyLoss(ignore_index=255)(logits, t.from_numpy(seg).long())
        opt.zero_grad()
        tl.backward()
        opt.step()
        torch_losses.append(float(tl))

    torch_named = _reference_named_tensors(ref)
    flat0 = dict(_flat_torch_named(params0))
    flat1 = dict(_flat_torch_named(jax.tree_util.tree_map(np.asarray, params)))
    flat_bs0 = dict(_flat_torch_named(bstats0))
    flat_bs = dict(_flat_torch_named(jax.tree_util.tree_map(np.asarray, bstats)))
    return (our_losses, torch_losses, flat0, flat1, flat_bs0, flat_bs,
            torch_named)


def test_train_step_parity_frozen_bn(rng, monkeypatch):
    """TIGHT train-dynamics parity: 3 SGD steps (momentum + weight decay +
    CE backward through the full net) under ``--freeze-batch-norm``
    semantics.  Frozen BN removes the batch-stat backward — the one part of
    the step that is ill-conditioned at random init (measured: batch-order
    reversal alone moves train-mode gradients by ~4.5e-2 relative L2) — so
    every remaining op must track torch to float precision."""
    (our_losses, torch_losses, flat0, flat1, flat_bs0, flat_bs,
     torch_named) = _run_parity_steps(rng, monkeypatch, freeze_bn=True)

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-5, atol=1e-6)

    # atol 5e-3 scaled: isolated relu-gate flips (an activation within one
    # f32 ulp of 0 resolving differently) move single elements by ~2e-3 of
    # the leaf's max delta; everything else sits below 1e-3.
    checked = 0
    for name in flat0:
        d_ours = flat1[name] - flat0[name]
        d_torch = torch_named[name] - flat0[name]
        scale = max(np.abs(d_torch).max(), 1e-10)
        np.testing.assert_allclose(d_ours / scale, d_torch / scale,
                                   rtol=0, atol=5e-3, err_msg=name)
        checked += 1
    assert checked > 100, checked
    assert max(np.abs(flat1[n] - flat0[n]).max() for n in flat0) > 1e-5

    # Frozen BN must NOT touch the running statistics.
    for name, arr in flat_bs.items():
        np.testing.assert_array_equal(arr, flat_bs0[name], err_msg=name)
        if not name.endswith('num_batches_tracked'):
            np.testing.assert_array_equal(arr, torch_named[name], err_msg=name)


def test_train_dynamics_mid_depth(rng, monkeypatch):
    """Train-mode BN dynamics: 3 SGD steps with LIVE batch statistics.

    Tolerances here are pinned to the MEASURED f32 conditioning of this
    configuration, not to wishful exactness: at random init the train-mode
    BN chain amplifies rounding — reordering the batch alone moves our own
    gradients by ~4.5e-2 relative L2 (torch behaves alike), so parameter
    deltas are asserted at 0.15 relative L2 (catches wiring/integrator bugs,
    which are O(1)).  The well-conditioned signals stay tight: per-step
    losses at 1e-4 and BN running-stat updates at 2e-3 scaled."""
    (our_losses, torch_losses, flat0, flat1, flat_bs0, flat_bs,
     torch_named) = _run_parity_steps(rng, monkeypatch, freeze_bn=False)

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-4, atol=1e-5)

    checked = 0
    moved = 0.0
    for name in flat0:
        d_ours = flat1[name] - flat0[name]
        d_torch = torch_named[name] - flat0[name]
        denom = max(float(np.linalg.norm(d_torch)), 1e-10)
        rel_l2 = float(np.linalg.norm(d_ours - d_torch)) / denom
        assert rel_l2 < 0.15, (name, rel_l2)
        moved = max(moved, float(np.abs(d_torch).max()))
        checked += 1
    assert checked > 100, checked
    assert moved > 1e-5

    # BN running statistics after 3 live updates (well-conditioned: simple
    # EMAs of batch moments, whose forwards agree to ~1e-3).
    stats_checked = 0
    for name, arr in flat_bs.items():
        if name.endswith('num_batches_tracked'):
            np.testing.assert_array_equal(arr, torch_named[name])
        else:
            assert np.abs(arr - flat_bs0[name]).max() > 0, name  # they moved
            scale = max(np.abs(torch_named[name]).max(), 1e-10)
            np.testing.assert_allclose(arr / scale, torch_named[name] / scale,
                                       rtol=0, atol=2e-3, err_msg=name)
        stats_checked += 1
    assert stats_checked > 50, stats_checked


def _flat_torch_named(tree):
    from dualsuperreslearningforsemseg_tpu.models.state_dict import (
        _to_torch_name_and_array)
    wrapped = {'params': tree} if 'params' not in tree else tree
    for key, value in flatten_variables(wrapped).items():
        yield _to_torch_name_and_array(key, value)


def _reference_named_tensors(ref):
    """Replica state dict as numpy under reference (= our) names."""
    out = {}
    for key, value in ref.state_dict().items():
        for src, dst in _PREFIX_MAP:
            if key.startswith(dst):
                out[src + key[len(dst):]] = value.detach().numpy()
                break
    return out
