"""On-device metric accumulation.

The reference computes mIoU/accuracy on the host with ``np.histogram`` per
batch (/root/reference/metrices/mIoU.py:27-29), forcing a full-logits D2H
copy every validation step.  Here the per-batch reductions run on device
inside the jitted eval step and only three 19-vectors (+2 scalars) come back.

Exactness: ``np.histogram(v, bins=19, range=(1, 19))`` over the shifted
integer labels (values 0..19 after the reference's +1 shift and masking)
assigns **exactly one integer value per bin** — bin k holds value k+1, value
0 falls left of the range and the out-of-range values never occur — so the
histogram is equivalent to a bincount over classes 1..19.  This equivalence
is asserted in tests against literal np.histogram.
"""

import jax
import jax.numpy as jnp


def argmax_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.argmax(x, axis=-1)`` as two simple reductions.

    ``jnp.argmax`` lowers to a variadic (value, index) reduce that costs
    ~30 ms/step on the (16,512,1024,19) eval logits on v5e; max followed by
    first-match-index (a where + min reduce) computes the identical result
    (first maximal index, like jnp/torch/np) in ~2 ms.  Returns int32.

    NaN rows: the max is NaN and ``x == m`` matches nothing, so the raw index
    would be ``n`` (out of range) where ``jnp.argmax`` returns the first NaN's
    index.  Such rows are clamped to ``n - 1`` so downstream histograms stay
    in-range; eval logits are NaN-free by construction (--debug-nans catches
    the alternative), so this divergence is unreachable in practice."""
    m = jnp.max(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    classes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    idx = jnp.min(jnp.where(x == m, classes, n), axis=-1)
    return jnp.minimum(idx, n - 1).astype(jnp.int32)


def batch_histograms(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                     ignore_label: int = 255):
    """Device-side equivalent of the reference mIoU.update() histograms.

    Args:
      pred: (B, H, W) int predicted classes in [0, num_classes).
      target: (B, H, W) int labels with ignore_label marking invalid pixels.

    Returns (area_pred, area_inter, area_target): (num_classes,) i32 each,
    where index k corresponds to class k (the reference's bin k / value k+1).
    """
    valid = (target != ignore_label)
    pred1 = pred.astype(jnp.int32) + 1
    target1 = target.astype(jnp.int32) + 1
    pred1 = pred1 * valid  # masked pixels -> 0 -> excluded from range (1..C)
    inter = pred1 * (pred1 == target1)

    def hist(v):
        # One-hot contraction over bin values 1..num_classes (value 0 and
        # out-of-range values drop out).  A scatter-add (`.at[idx].add(1)`)
        # over the ~8M pixel indices costs ~100 ms/step on TPU; the
        # compare-and-reduce is pure vector math that XLA fuses (CLAUDE.md
        # perf rule 1: no dynamic gathers/scatters in hot device code).
        # Reduce in v's NATIVE shape: an earlier reshape(-1) formulation
        # forced physical relayouts of the conv-tiled int tensors into
        # linear layout (~14 ms/step of s32/pred copies in the v5e eval
        # trace); the broadcast compare + all-axes reduce fuses in place.
        bins = jnp.arange(1, num_classes + 1, dtype=jnp.int32)
        vc = jnp.clip(v, 0, num_classes).astype(jnp.int32)
        return jnp.sum((vc[..., None] == bins).astype(jnp.int32),
                       axis=tuple(range(vc.ndim)))

    # target1 for ignored pixels is 256 (=255+1): clip() would wrongly count
    # it into the last bin, so mask targets out of range explicitly.
    t_masked = jnp.where(target1 <= num_classes, target1, 0)
    return hist(pred1), hist(inter), hist(t_masked)


def batch_accuracy_counts(pred: jnp.ndarray, target: jnp.ndarray, ignore_label: int = 255):
    """(correct_pixels, valid_pixels) for the reference Accuracy metric."""
    valid = (target != ignore_label)
    correct = ((pred == target) & valid).sum()
    return correct, valid.sum()
