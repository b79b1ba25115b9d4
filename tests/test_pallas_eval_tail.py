"""Fused eval-tail Pallas kernel vs the XLA composition.

The eval kernel (ops/pallas/eval_tail.py) must reproduce, from the cols
carry, exactly what the ungrouped XLA path computes: the masked-mean CE of
``cross_entropy_loss``, the class map of ``argmax_lastdim`` (first-maximal
tie-break), the three ``batch_histograms`` areas (prediction/intersection
restricted to valid pixels, target to in-range labels) and the
``batch_accuracy_counts`` pair — all without materializing the logits.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss
from dualsuperreslearningforsemseg_tpu.metrics.device import (
    argmax_lastdim, batch_histograms, batch_accuracy_counts)
from dualsuperreslearningforsemseg_tpu.ops.conv import (
    conv_transpose_2x2_stride2, group_labels_g16_t)
from dualsuperreslearningforsemseg_tpu.ops.pallas.eval_tail import fused_convt2_eval

from dualsuperreslearningforsemseg_tpu.train import ungroup_pred_sample
from tail_layout import to_cols


def _case(rng, b=2, h=8, w=16, ignore_rows=5):
    c = 19
    y1 = jnp.asarray(rng.standard_normal((b, h, w, 4, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((c, c, 2, 2)) * 0.2, jnp.float32)
    bi = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    seg = rng.integers(0, c, size=(b, h * 4, w * 4)).astype(np.int32)
    if ignore_rows:
        seg[0, :ignore_rows] = 255
    return y1, wt, bi, jnp.asarray(seg)


def _xla_reference(y1, wt, bi, seg):
    """Full-resolution XLA composition of everything the kernel fuses."""
    from dualsuperreslearningforsemseg_tpu.ops.conv import ungroup_2x2
    full = ungroup_2x2(y1)                                  # (B, 2H, 2W, C)
    logits = conv_transpose_2x2_stride2(full, wt, bi)       # (B, 4H, 4W, C)
    ce = cross_entropy_loss(logits, seg, 255)
    pred = argmax_lastdim(logits)
    hists = batch_histograms(pred, seg, 19, 255)
    acc = batch_accuracy_counts(pred, seg, 255)
    return ce, pred, hists, acc


def test_eval_tail_matches_xla(rng):
    y1, wt, bi, seg = _case(rng)
    labs_t = group_labels_g16_t(seg)

    ce_ref, pred_ref, hists_ref, acc_ref = _xla_reference(y1, wt, bi, seg)
    pred_t, ce, hists, acc = fused_convt2_eval(
        to_cols(y1), wt, bi, labs_t, 255, 19, interpret=True)

    np.testing.assert_allclose(float(ce), float(ce_ref), rtol=1e-5, atol=1e-7)
    for h_new, h_ref in zip(hists, hists_ref):
        np.testing.assert_array_equal(np.asarray(h_new), np.asarray(h_ref))
    assert int(acc[0]) == int(acc_ref[0])
    assert int(acc[1]) == int(acc_ref[1])

    # Class map: the (16, N) g16-major layout must ungroup to the full-res
    # argmax exactly (same einsum order on both sides -> bit-identical).
    b, hh, ww = seg.shape
    pred_t = np.asarray(pred_t).reshape(16, b, hh // 4, ww // 4)
    full = np.stack([ungroup_pred_sample(pred_t[:, i], 'g16') for i in range(b)])
    np.testing.assert_array_equal(full, np.asarray(pred_ref))


def test_eval_tail_all_ignored(rng):
    y1, wt, bi, seg = _case(rng)
    labs_all = jnp.full_like(group_labels_g16_t(seg), 255)
    _, ce, hists, acc = fused_convt2_eval(
        to_cols(y1), wt, bi, labs_all, 255, 19, interpret=True)
    assert float(ce) == 0.0
    assert int(acc[1]) == 0 and int(acc[0]) == 0
    assert int(np.asarray(hists[0]).sum()) == 0   # no valid pixels
    assert int(np.asarray(hists[1]).sum()) == 0
    assert int(np.asarray(hists[2]).sum()) == 0   # 255 is out of range


def test_eval_tail_tie_break_lowest_class(rng):
    """Ties in the logits must pick the lowest class index, like
    argmax_lastdim / jnp.argmax."""
    y1, wt, bi, seg = _case(rng, ignore_rows=0)
    # Zero weights and bias make every class logit equal (all ties).
    wt0 = jnp.zeros_like(wt)
    bi0 = jnp.zeros_like(bi)
    pred_t, _, hists, _ = fused_convt2_eval(
        to_cols(y1), wt0, bi0, group_labels_g16_t(seg), 255, 19,
        interpret=True)
    assert int(np.asarray(pred_t).max()) == 0
    assert int(np.asarray(hists[0])[0]) == seg.size  # all pixels -> class 0


def test_eval_tail_out_of_range_labels_match_xla(rng):
    """Same contract as the train kernel (shared _ce_terms): a label in the
    pad band [19, 32) contributes its full logsumexp to the CE, not a pad
    row's -1e30 bias."""
    y1, wt, bi, seg = _case(rng, ignore_rows=0)
    seg = np.asarray(seg).copy()
    seg[0, :3] = 25
    seg[1, :2] = 40
    seg = jnp.asarray(seg)
    ce_ref, pred_ref, hists_ref, acc_ref = _xla_reference(y1, wt, bi, seg)
    _, ce, hists, acc = fused_convt2_eval(
        to_cols(y1), wt, bi, group_labels_g16_t(seg), 255, 19,
        interpret=True)
    assert np.isfinite(float(ce))
    np.testing.assert_allclose(float(ce), float(ce_ref), rtol=1e-5, atol=1e-7)
    for h_new, h_ref in zip(hists, hists_ref):
        np.testing.assert_array_equal(np.asarray(h_new), np.asarray(h_ref))
    assert int(acc[0]) == int(acc_ref[0]) and int(acc[1]) == int(acc_ref[1])


def test_eval_tail_nan_logits_clamp_like_argmax_lastdim(rng):
    """All-NaN logit pixels (a diverged checkpoint under eval) must produce
    the same clamped class num_classes-1 as argmax_lastdim, not the
    out-of-range block sentinel 32."""
    y1, wt, bi, seg = _case(rng, ignore_rows=0)
    y1 = jnp.full_like(y1, jnp.nan)
    _, pred_ref, hists_ref, _ = _xla_reference(y1, wt, bi, seg)
    pred_t, ce, hists, _ = fused_convt2_eval(
        to_cols(y1), wt, bi, group_labels_g16_t(seg), 255, 19,
        interpret=True)
    assert np.isnan(float(ce))         # CE is NaN on both paths
    p = np.asarray(pred_t)
    assert p.min() == p.max() == 18 == int(np.asarray(pred_ref).max())
    for h_new, h_ref in zip(hists, hists_ref):
        np.testing.assert_array_equal(np.asarray(h_new), np.asarray(h_ref))
