"""Fused final-ConvT + CE Pallas kernel vs the XLA composition.

The kernel (ops/pallas/fused_tail.py) must reproduce
``cross_entropy_loss(conv_transpose_2x2_stride2_grouped(y1, W, b), labels)``
— value and all three gradients — including ignore-label masking and the
no-valid-pixels guard; and the train step with ``fused_tail=True`` must march
in lockstep with the XLA path on a sharded mesh.  The kernel consumes the
cols carry (B, H, W, 4*32); ``tail_layout.to_cols`` maps the natural grouped activation
into it with differentiable ops so the gradient comparison runs in natural
shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss
from dualsuperreslearningforsemseg_tpu.ops.conv import (
    conv_transpose_2x2_stride2_grouped, group_labels, group_labels_g16_t)
from dualsuperreslearningforsemseg_tpu.ops.pallas.fused_tail import fused_convt2_ce_mean

from tail_layout import to_cols




def _case(rng, b=2, h=8, w=16, ignore_rows=5):
    c = 19
    y1 = jnp.asarray(rng.standard_normal((b, h, w, 4, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((c, c, 2, 2)) * 0.2, jnp.float32)
    bi = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    seg = rng.integers(0, c, size=(b, h * 4, w * 4)).astype(np.int32)
    if ignore_rows:
        seg[0, :ignore_rows] = 255
    return y1, wt, bi, group_labels(jnp.asarray(seg), 4), jnp.asarray(seg)


def test_fused_tail_matches_xla_value_and_grads(rng):
    y1, wt, bi, seg_g, seg = _case(rng)
    labs_t = group_labels_g16_t(seg)

    def ref(y1, wt, bi):
        logits = conv_transpose_2x2_stride2_grouped(y1, wt, bi)
        return cross_entropy_loss(logits, seg_g, 255)

    def fused(y1, wt, bi):
        return fused_convt2_ce_mean(to_cols(y1), wt, bi, labs_t, 255,
                                    interpret=True)

    v1, g1 = jax.value_and_grad(ref, argnums=(0, 1, 2))(y1, wt, bi)
    v2, g2 = jax.value_and_grad(fused, argnums=(0, 1, 2))(y1, wt, bi)
    assert abs(float(v1) - float(v2)) < 1e-5
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fused_tail_all_pixels_ignored(rng):
    y1, wt, bi, _, seg = _case(rng)
    labs_all = jnp.full_like(group_labels_g16_t(seg), 255)
    y1c = to_cols(y1)
    v = fused_convt2_ce_mean(y1c, wt, bi, labs_all, 255, interpret=True)
    assert float(v) == 0.0  # matches cross_entropy_loss's count == 0 guard
    # and the gradient through the guard is zero, not NaN
    g = jax.grad(lambda y: fused_convt2_ce_mean(y, wt, bi, labs_all, 255,
                                                interpret=True))(y1c)
    assert not np.any(np.isnan(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_group_labels_g16_t_matches_group_labels(rng):
    _, _, _, seg_g, seg = _case(rng, b=3, h=4, w=8, ignore_rows=2)
    lt = group_labels_g16_t(seg)
    # group_labels(seg, 4) is (B, H, W, 16) nested; row g16, column (b,h,w).
    ref = np.asarray(seg_g).reshape(-1, 16).T.astype(np.uint8)
    assert lt.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(lt), ref)


@pytest.mark.parametrize('stage', [1, 3])
def test_train_step_fused_tail_matches_xla_path(rng, stage):
    """One full train step, 8-device mesh: fused_tail=True == fused_tail=False."""
    from dualsuperreslearningforsemseg_tpu.models import DSRL
    from dualsuperreslearningforsemseg_tpu.parallel import (make_mesh, replicate,
                                                            batch_sharding)
    from dualsuperreslearningforsemseg_tpu.train import (sgd_init, make_train_step,
                                                         TrainState)

    input_hw, output_hw = (64, 128), (128, 256)
    model = DSRL(stage=stage, num_classes=19, backbone_layers=(1, 1, 2, 1))
    variables = jax.tree.map(np.asarray, model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        jnp.zeros((1, *input_hw, 3)), False))
    mesh = make_mesh()

    def fresh():
        host = jax.tree.map(lambda x: np.array(x, copy=True), variables)
        return TrainState(replicate(host['params'], mesh),
                          replicate(host['batch_stats'], mesh),
                          replicate(sgd_init(host['params']), mesh))

    B = 8
    img_lo = jax.device_put(rng.standard_normal((B, *input_hw, 3)).astype(np.float32),
                            batch_sharding(mesh, 4))
    img_hi = jax.device_put(rng.standard_normal((B, *output_hw, 3)).astype(np.float32),
                            batch_sharding(mesh, 4))
    seg = rng.integers(0, 19, size=(B, *output_hw)).astype(np.int32)
    seg[:, :7] = 255
    seg = jax.device_put(seg, batch_sharding(mesh, 3))
    key, lr = jax.random.PRNGKey(5), jnp.float32(0.01)

    out = {}
    for fused in (False, True):
        ts = make_train_step(model, stage=stage, w1=0.1, w2=1.0, momentum=0.9,
                             weight_decay=5e-4, ignore_label=255, mesh=mesh,
                             fused_tail=fused)
        st, losses = ts(fresh(), img_lo, img_hi, seg, lr, key)
        out[fused] = (jax.tree.map(np.asarray, losses),
                      jax.tree.map(np.asarray, st.params))

    for k in out[False][0]:
        assert abs(float(out[False][0][k]) - float(out[True][0][k])) < 1e-5, k
    for a, b in zip(jax.tree.leaves(out[False][1]), jax.tree.leaves(out[True][1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_tail_out_of_range_labels_match_xla(rng):
    """Corrupted non-ignore labels must contribute their pixel's full
    logsumexp — exactly what the XLA one-hot contraction yields (picked
    logit 0) — and must NOT match a pad class row, whose -1e30 bias would
    blow a single pixel's NLL up to ~1e30 and destroy the batch mean."""
    y1, wt, bi, _, seg = _case(rng, ignore_rows=0)
    seg = np.asarray(seg).copy()
    seg[0, :3] = 25    # inside the kernel's pad-class band [19, 32)
    seg[1, :2] = 40    # beyond the 32-row class block entirely
    seg = jnp.asarray(seg)
    seg_g = group_labels(seg, 4)
    labs_t = group_labels_g16_t(seg)

    def ref(y1, wt, bi):
        logits = conv_transpose_2x2_stride2_grouped(y1, wt, bi)
        return cross_entropy_loss(logits, seg_g, 255)

    def fused(y1, wt, bi):
        return fused_convt2_ce_mean(to_cols(y1), wt, bi, labs_t, 255,
                                    interpret=True)

    v1, g1 = jax.value_and_grad(ref, argnums=(0, 1, 2))(y1, wt, bi)
    v2, g2 = jax.value_and_grad(fused, argnums=(0, 1, 2))(y1, wt, bi)
    assert np.isfinite(float(v2))
    assert abs(float(v1) - float(v2)) < 1e-5
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
