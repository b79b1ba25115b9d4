"""Eval-step sample-mask exactness: padded rows must not change any loss or
metric relative to evaluating the unpadded batch."""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.train import make_eval_step


def _setup(stage):
    model = DSRL(stage=stage, num_classes=19)
    hw = (64, 128)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, False)
    return model, variables, hw


def test_grouped_eval_matches_ungrouped_reference(rng):
    """make_eval_step runs the model in GROUPED layout (train/steps.py) —
    its losses, metrics and full-res class map must equal the plain
    ungrouped forward's, up to the einsum-order float noise the grouped
    train paths are held to (tests/test_grouped_tail.py)."""
    from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss
    from dualsuperreslearningforsemseg_tpu.metrics.device import (
        argmax_lastdim, batch_histograms, batch_accuracy_counts)

    model, variables, hw = _setup(3)
    ohw = (2 * hw[0], 2 * hw[1])
    eval_step = make_eval_step(model, 3, 0.1, 1.0, 19, 255)

    b = 2
    img_lo = jnp.asarray(rng.standard_normal((b, *hw, 3), dtype=np.float32))
    img_hi = jnp.asarray(rng.standard_normal((b, *ohw, 3), dtype=np.float32))
    seg = jnp.asarray(rng.integers(0, 19, size=(b, *ohw)).astype(np.int32))
    seg = seg.at[:, :5].set(255)
    mask = jnp.ones((b,), jnp.float32)

    losses, pred, hists, acc = eval_step(
        variables['params'], variables['batch_stats'], img_lo, img_hi, seg, mask)

    sssr, sisr, sssr_t, sisr_t = model.apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, img_lo, False)
    ce_ref = cross_entropy_loss(sssr, seg, 255)
    mse_ref = 0.1 * jnp.mean((sisr.astype(jnp.float32)
                              - img_hi.astype(jnp.float32)) ** 2)
    from dualsuperreslearningforsemseg_tpu.losses import fa_loss
    fa_ref = 1.0 * jnp.mean(jax.vmap(
        lambda a, c: fa_loss(a[None], c[None]))(sssr_t, sisr_t))
    pred_ref = argmax_lastdim(sssr)
    hists_ref = batch_histograms(pred_ref, seg, 19, 255)
    acc_ref = batch_accuracy_counts(pred_ref, seg, 255)

    np.testing.assert_allclose(float(losses['CE']), float(ce_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(losses['MSE']), float(mse_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(losses['FA']), float(fa_ref),
                               rtol=1e-4, atol=1e-6)
    # pred comes back in the compact layout the step PUBLISHES via
    # fn.pred_layout; the host-side per-sample ungroup must reproduce the
    # full-res map exactly.
    from dualsuperreslearningforsemseg_tpu.train import ungroup_pred_sample
    layout = eval_step.pred_layout
    pred = np.asarray(pred)
    samples = ([pred[:, i] for i in range(pred.shape[1])]
               if layout == 'g16' else list(pred))
    pred_full = np.stack([ungroup_pred_sample(p, layout) for p in samples])
    # The class maps may flip only where the einsum-order noise ties the
    # top-2 logits (measure-zero on random data).
    mismatch = int(np.sum(pred_full != np.asarray(pred_ref)))
    assert pred_full.shape == pred_ref.shape
    assert mismatch <= 2, "class maps diverge on {} pixels".format(mismatch)
    for h_new, h_ref in zip(hists, hists_ref):
        assert int(jnp.abs(h_new - h_ref).sum()) <= 4
    assert abs(int(acc[0]) - int(acc_ref[0])) <= 2
    assert int(acc[1]) == int(acc_ref[1])


def test_padding_is_exact_stage3(rng):
    model, variables, hw = _setup(3)
    ohw = (2 * hw[0], 2 * hw[1])
    eval_step = make_eval_step(model, 3, 0.1, 1.0, 19, 255)

    b = 3
    img_lo = jnp.asarray(rng.standard_normal((b, *hw, 3), dtype=np.float32))
    img_hi = jnp.asarray(rng.standard_normal((b, *ohw, 3), dtype=np.float32))
    seg = jnp.asarray(rng.integers(0, 19, size=(b, *ohw)).astype(np.int32))

    # Unpadded reference
    losses_ref, _, hists_ref, acc_ref = eval_step(
        variables['params'], variables['batch_stats'], img_lo, img_hi, seg,
        jnp.ones((b,), jnp.float32))

    # Padded to 4 with junk rows + mask
    pad = 1
    img_lo_p = jnp.concatenate([img_lo, jnp.ones((pad, *hw, 3))])
    img_hi_p = jnp.concatenate([img_hi, jnp.ones((pad, *ohw, 3))])
    seg_p = jnp.concatenate([seg, jnp.full((pad, *ohw), 7, jnp.int32)])
    mask = jnp.asarray([1.0] * b + [0.0] * pad)
    losses_pad, _, hists_pad, acc_pad = eval_step(
        variables['params'], variables['batch_stats'], img_lo_p, img_hi_p,
        seg_p, mask)

    for k in losses_ref:
        assert abs(float(losses_ref[k]) - float(losses_pad[k])) < 1e-5, k
    for h_ref, h_pad in zip(hists_ref, hists_pad):
        np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_pad))
    assert int(acc_ref[0]) == int(acc_pad[0])
    assert int(acc_ref[1]) == int(acc_pad[1])


def test_fused_eval_matches_xla_fallback(rng):
    """make_eval_step's fused Pallas tail (default) and its XLA fallback
    (fused_tail=False) must agree on every loss, histogram and count, and
    their class maps must reconstruct to the same full-res image."""
    from dualsuperreslearningforsemseg_tpu.train import ungroup_pred_sample

    model, variables, hw = _setup(3)
    ohw = (2 * hw[0], 2 * hw[1])
    b = 2
    img_lo = jnp.asarray(rng.standard_normal((b, *hw, 3), dtype=np.float32))
    img_hi = jnp.asarray(rng.standard_normal((b, *ohw, 3), dtype=np.float32))
    seg = jnp.asarray(rng.integers(0, 19, size=(b, *ohw)).astype(np.int32))
    seg = seg.at[1, -7:].set(255)
    mask = jnp.ones((b,), jnp.float32)

    fused = make_eval_step(model, 3, 0.1, 1.0, 19, 255)
    plain = make_eval_step(model, 3, 0.1, 1.0, 19, 255, fused_tail=False)
    args = (variables['params'], variables['batch_stats'],
            img_lo, img_hi, seg, mask)
    losses_f, pred_f, hists_f, acc_f = fused(*args)
    losses_p, pred_p, hists_p, acc_p = plain(*args)

    for k in losses_p:
        np.testing.assert_allclose(float(losses_f[k]), float(losses_p[k]),
                                   rtol=2e-5, atol=1e-6)
    for h_f, h_p in zip(hists_f, hists_p):
        assert int(jnp.abs(h_f - h_p).sum()) <= 4  # argmax tie noise bound
    assert abs(int(acc_f[0]) - int(acc_p[0])) <= 2
    assert int(acc_f[1]) == int(acc_p[1])

    assert fused.pred_layout == 'g16' and plain.pred_layout == 'grouped'
    pred_f = np.asarray(pred_f)   # (16, B, h, w) g16-major
    pred_p = np.asarray(pred_p)   # (B, h, w, 16) grouped
    assert pred_f.shape[0] == 16 and pred_f.shape[1] == b
    for i in range(b):
        a = ungroup_pred_sample(pred_f[:, i], 'g16')
        c = ungroup_pred_sample(pred_p[i], 'grouped')
        assert a.shape == c.shape == ohw
        assert int(np.sum(a != c)) <= 2


def test_spatial_mesh_falls_back_to_grouped_layout():
    """A ('data', 'spatial') mesh must disable the fused eval tail (its
    flattened operands don't shard over H) and publish the fallback layout."""
    import jax
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh

    devs = jax.devices()
    if len(devs) < 2:
        import pytest
        pytest.skip("needs >= 2 devices for a spatial mesh")
    mesh = make_mesh(devs[:2], spatial=2)
    model = DSRL(stage=1, num_classes=19)
    step = make_eval_step(model, 1, 0.1, 1.0, 19, 255, mesh=mesh)
    assert step.pred_layout == 'grouped'
    # Data-only meshes keep the fused tail.
    step = make_eval_step(model, 1, 0.1, 1.0, 19, 255,
                          mesh=make_mesh(devs[:2]))
    assert step.pred_layout == 'g16'
