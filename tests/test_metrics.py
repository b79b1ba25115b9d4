"""Metric parity: host path vs literal reference numpy semantics, and the
on-device histogram path vs np.histogram."""

import numpy as np
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.metrics import (
    mIoU, Accuracy, AverageMeter, batch_histograms, batch_accuracy_counts)


def _reference_miou_batches(batches, num_classes=19):
    """Literal transcription of /root/reference/metrices/mIoU.py math."""
    ious = []
    for pred, target, mask in batches:
        pred = pred.astype(np.int64) + 1
        target = target.astype(np.int64) + 1
        pred = pred * mask
        inter = pred * (pred == target)
        ap, _ = np.histogram(pred, bins=num_classes, range=(1, num_classes))
        ai, _ = np.histogram(inter, bins=num_classes, range=(1, num_classes))
        at, _ = np.histogram(target, bins=num_classes, range=(1, num_classes))
        union = ap + at - ai
        with np.errstate(divide='ignore', invalid='ignore'):
            ious.append(np.nanmean(ai / union))
    return float(np.nanmean(ious) * 100.0)


def _make_batches(rng, n=3, num_classes=19):
    batches = []
    for _ in range(n):
        target = rng.integers(0, num_classes, size=(2, 16, 32))
        target[0, :2, :2] = 255
        pred = rng.integers(0, num_classes, size=(2, 16, 32))
        mask = target != 255
        batches.append((pred, target, mask))
    return batches


def test_miou_host_matches_reference(rng):
    batches = _make_batches(rng)
    m = mIoU(num_classes=19)
    for pred, target, mask in batches:
        m.update(pred, target, mask)
    assert abs(m() - _reference_miou_batches(batches)) < 1e-9


def test_miou_device_path_matches_host(rng):
    batches = _make_batches(rng)
    m_host = mIoU(num_classes=19)
    m_dev = mIoU(num_classes=19)
    for pred, target, mask in batches:
        m_host.update(pred, target, mask)
        ap, ai, at = batch_histograms(jnp.asarray(pred), jnp.asarray(target), 19, 255)
        m_dev.update_from_areas(np.asarray(ap), np.asarray(ai), np.asarray(at))
    assert abs(m_host() - m_dev()) < 1e-9


def test_device_histograms_match_np_histogram(rng):
    """The bincount formulation must equal np.histogram(range=(1,19),bins=19)
    bin-for-bin, including the ignore-label interactions."""
    target = rng.integers(0, 19, size=(1, 8, 8))
    target[0, 0, :4] = 255
    pred = rng.integers(0, 19, size=(1, 8, 8))
    mask = target != 255

    p1 = pred.astype(np.int64) + 1
    t1 = target.astype(np.int64) + 1
    p1m = p1 * mask
    inter = p1m * (p1m == t1)
    ap_np, _ = np.histogram(p1m, bins=19, range=(1, 19))
    ai_np, _ = np.histogram(inter, bins=19, range=(1, 19))
    at_np, _ = np.histogram(t1, bins=19, range=(1, 19))

    ap, ai, at = batch_histograms(jnp.asarray(pred), jnp.asarray(target), 19, 255)
    np.testing.assert_array_equal(np.asarray(ap), ap_np)
    np.testing.assert_array_equal(np.asarray(ai), ai_np)
    np.testing.assert_array_equal(np.asarray(at), at_np)


def test_accuracy_matches_reference(rng):
    target = rng.integers(0, 19, size=(2, 8, 8))
    target[0, 0, :] = 255
    pred = rng.integers(0, 19, size=(2, 8, 8))
    mask = target != 255

    a = Accuracy()
    a.update(pred, target, mask)
    expected = ((pred == target) * mask).sum() / mask.sum() * 100.0
    assert abs(a() - expected) < 1e-9

    correct, valid = batch_accuracy_counts(jnp.asarray(pred), jnp.asarray(target), 255)
    a2 = Accuracy()
    a2.update_from_counts(int(correct), int(valid))
    assert abs(a() - a2()) < 1e-9


def test_average_meter(rng):
    m = AverageMeter()
    m.update(2.0, 3)
    m.update(4.0, 1)
    assert abs(m() - (2.0 * 3 + 4.0) / 4) < 1e-12
    assert m.val == 4.0


def test_argmax_lastdim_matches_jnp_argmax(rng):
    """First-match semantics incl. ties, any rank."""
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.metrics.device import argmax_lastdim
    x = rng.standard_normal((3, 5, 7, 19)).astype(np.float32)
    x[0, 0, 0, 3] = x[0, 0, 0, 11] = x[0, 0, 0].max() + 1.0   # tie -> first wins
    x[1, 2] = 0.0                                              # all-equal rows
    got = np.asarray(argmax_lastdim(jnp.asarray(x)))
    want = np.asarray(jnp.argmax(jnp.asarray(x), axis=-1))
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.int32


def test_argmax_lastdim_nan_rows_stay_in_range():
    """NaN rows clamp to the last class instead of emitting index n (which
    would silently fall out of downstream histograms — ADVICE r2)."""
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.metrics.device import argmax_lastdim
    x = np.array([[0.0, 1.0, 2.0], [np.nan, np.nan, np.nan],
                  [1.0, np.nan, 0.0]], np.float32)
    got = np.asarray(argmax_lastdim(jnp.asarray(x)))
    assert got.min() >= 0 and got.max() <= 2
    assert got[0] == 2
