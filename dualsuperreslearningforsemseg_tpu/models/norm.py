"""Batch normalization with exact PyTorch semantics.

Written from scratch (rather than ``flax.linen.BatchNorm``) for three reasons
that all affect parity with the reference:

* torch updates ``running_var`` with the **unbiased** batch variance while
  normalizing with the biased one (flax uses biased for both);
* torch tracks ``num_batches_tracked`` in the state dict
  (/root/reference checkpoints contain it);
* parameter/state naming (weight/bias/running_mean/running_var) matches the
  torch state-dict layout directly, so checkpoint import/export needs no
  per-layer special cases.

Statistics and normalization run in f32 regardless of the (possibly bf16)
activation dtype; XLA fuses the casts.  ``use_running_average=True`` during
training implements the reference's ``--freeze-batch-norm`` mode
(/root/reference/command_handlers/train_or_resume.py:379-382) — frozen layers
neither use batch statistics nor update the running ones.

Under data parallelism statistics are per-replica, matching the reference,
which never converts to SyncBatchNorm (SURVEY.md §2.3).  Cross-replica stats
can be enabled with ``axis_name`` as an explicit improvement flag.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class TorchBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1          # torch default: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None  # set to mesh axis for cross-replica stats
    weight_init: nn.initializers.Initializer = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        f = self.features
        weight = self.param('weight', self.weight_init, (f,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'running_mean',
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable('batch_stats', 'running_var',
                               lambda: jnp.ones((f,), jnp.float32))
        nbt = self.variable('batch_stats', 'num_batches_tracked',
                            lambda: jnp.zeros((), jnp.int32))

        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            if self.axis_name is not None:
                # Exact cross-replica statistics (true SyncBatchNorm): reduce
                # the first two moments over the named axis, then
                # var = E[x²] − mean² — identical to single-device BN over
                # the concatenated batch.
                mean = jax.lax.pmean(xf.mean(axis=reduce_axes), self.axis_name)
                mean_sq = jax.lax.pmean((xf * xf).mean(axis=reduce_axes), self.axis_name)
                var = jnp.maximum(mean_sq - mean * mean, 0.0)
                n *= jax.lax.psum(1, self.axis_name)
            else:
                # Single-pass moments: E[x^2] - mean^2 reads the activation
                # once (both accumulators share the pass), where torch's
                # two-pass E[(x-mean)^2] forces a second full read of every
                # BN input per step — ~100 BN layers make that a measurable
                # HBM tax.  In f32 the reassociation error is ~1e-7 relative
                # for unit-scale activations (parity tests bound it).
                mean = xf.mean(axis=reduce_axes)
                mean_sq = (xf * xf).mean(axis=reduce_axes)
                var = jnp.maximum(mean_sq - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
                nbt.value = nbt.value + 1

        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (xf - mean) * (inv * weight) + bias
        return y.astype(self.dtype)
