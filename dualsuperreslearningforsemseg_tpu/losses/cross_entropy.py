"""Pixel-wise cross entropy with ignore-index.

Exact semantics of ``torch.nn.CrossEntropyLoss(ignore_index=...)`` with the
default ``reduction='mean'`` (/root/reference/command_handlers/
train_or_resume.py:116,435): the sum of per-pixel NLL over valid pixels
divided by the number of valid pixels.  Log-softmax and the reduction run in
f32 regardless of the (possibly bf16) logits dtype.
"""

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray,
                       ignore_index: int = 255) -> jnp.ndarray:
    """Args:
      logits: (B, H, W, NUM_CLASSES) raw scores, NHWC.
      target: (B, H, W) integer class labels; ``ignore_index`` marks invalid.

    Returns: scalar f32 mean loss over valid pixels (0 if none are valid).
    """
    logits = logits.astype(jnp.float32)
    valid = (target != ignore_index)
    # One-hot contraction instead of take_along_axis: a per-pixel label
    # gather over (B*H*W,) indices lowers to a TPU dynamic gather measured at
    # ~175 ms/step (4M indices); the iota-compare + masked reduce is pure
    # vector math and fuses into the softmax.  NLL in the
    # ``logsumexp - picked_logit`` form: for in-range labels this is exactly
    # ``-log_softmax[label]``, and a corrupted out-of-range (non-ignore)
    # label contributes its pixel's full logsumexp — the same value the
    # fused Pallas tail produces for that pixel (fused_tail.py), instead of
    # a silent 0 that would deflate the mean.  (torch itself device-asserts
    # on such labels; they cannot occur through the dataset LUT.)
    classes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    onehot = (classes == target.astype(jnp.int32)[..., None])
    picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
    nll = jax.nn.logsumexp(logits, axis=-1) - picked
    nll = jnp.where(valid, nll, 0.0)
    count = valid.sum()
    return jnp.where(count > 0, nll.sum() / jnp.maximum(count, 1), 0.0)
