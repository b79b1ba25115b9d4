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

Statistics accumulate in f32 regardless of the (possibly bf16) activation
dtype; normalization runs in the activation dtype (see the in-body note on
why the f32 activation must never materialize).  ``use_running_average=True`` during
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
    def __call__(self, x: jnp.ndarray, use_running_average: bool,
                 cols_blocks: int = 0) -> jnp.ndarray:
        """``cols_blocks=G`` normalizes a channel-padded-columns tensor:
        the trailing axis holds G blocks of ``blk = x.shape[-1] // G``
        columns, of which the first ``features`` per block are real channels
        (the rest are zero padding).  Each block is an independent pixel set
        of the SAME ``features`` channels (the fused-tail carry — see
        ops/conv.py::conv_transpose_2x2_stride2_cols), so the per-channel
        statistics pool over the block axis too, exactly like the natural
        (..., features) orientation pooling over its group axis.  Parameter
        and running-stat trees are identical in both orientations."""
        f = self.features
        weight = self.param('weight', self.weight_init, (f,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'running_mean',
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable('batch_stats', 'running_var',
                               lambda: jnp.ones((f,), jnp.float32))
        nbt = self.variable('batch_stats', 'num_batches_tracked',
                            lambda: jnp.zeros((), jnp.int32))

        reduce_axes = tuple(range(x.ndim - 1))
        if cols_blocks:
            blk = x.shape[-1] // cols_blocks
            assert blk * cols_blocks == x.shape[-1] and blk >= f, \
                "cols layout: trailing dim {} must be {} blocks of >= {}".format(
                    x.shape[-1], cols_blocks, f)

        def _fold(vec):
            """Per-column (G*blk,) moments -> per-channel (f,) — blocks hold
            equal element counts, so the channel moment is the block mean."""
            if not cols_blocks:
                return vec
            return jnp.mean(vec.reshape(cols_blocks, blk)[:, :f], axis=0)

        def _tile(vec, pad=0.0):
            """Per-channel (f,) constants -> per-column (G*blk,)."""
            if not cols_blocks:
                return vec
            padded = jnp.pad(vec.reshape(1, f), ((0, 0), (0, blk - f)),
                             constant_values=pad)
            return jnp.broadcast_to(padded, (cols_blocks, blk)).reshape(-1)

        # Stats accumulate in f32 but the f32 activation is never
        # materialized: each moment reduction fuses its own upcast
        # (convert_reduce_fusion), and the normalization below runs in the
        # activation dtype.  Upcasting once and sharing (`xf = x.astype`)
        # makes XLA materialize + relayout the full f32 tensor when the
        # activation is bf16 — ~1 ms/step at the decoder-tail shapes on v5e.
        def _moments(v):
            mean = jnp.mean(v, axis=reduce_axes, dtype=jnp.float32)
            mean_sq = jnp.mean(jnp.square(v.astype(jnp.float32)),
                               axis=reduce_axes)
            return mean, mean_sq

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = cols_blocks or 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            if self.axis_name is not None:
                # Exact cross-replica statistics (true SyncBatchNorm): reduce
                # the first two moments over the named axis, then
                # var = E[x²] − mean² — identical to single-device BN over
                # the concatenated batch.
                mean, mean_sq = _moments(x)
                mean, mean_sq = _fold(mean), _fold(mean_sq)
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                var = jnp.maximum(mean_sq - mean * mean, 0.0)
                n *= jax.lax.psum(1, self.axis_name)
            else:
                # Single-pass moments: E[x^2] - mean^2 reads the activation
                # once (both accumulators share the pass), where torch's
                # two-pass E[(x-mean)^2] forces a second full read of every
                # BN input per step — ~100 BN layers make that a measurable
                # HBM tax.  In f32 the reassociation error is ~1e-7 relative
                # for unit-scale activations (parity tests bound it).
                mean, mean_sq = _moments(x)
                mean, mean_sq = _fold(mean), _fold(mean_sq)
                var = jnp.maximum(mean_sq - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
                nbt.value = nbt.value + 1

        # Normalize in the activation dtype: the per-channel constants round
        # once to bf16 (<= 1 ulp on the output, which is emitted in
        # self.dtype either way), and f32 activations take the exact same
        # ops as before (the casts are no-ops).
        inv = jax.lax.rsqrt(var + self.epsilon)
        # In cols mode the constants tile over the blocks; padded columns get
        # scale 0 / bias 0, so whatever they carry normalizes to exactly 0.
        sub = _tile(mean)
        scale = _tile(inv * weight)
        shift = _tile(bias)
        y = ((x - sub.astype(x.dtype)) * scale.astype(x.dtype)
             + shift.astype(x.dtype))
        return y.astype(self.dtype)


class FastDropout(nn.Module):
    """Inverted dropout (torch ``nn.Dropout`` semantics) with an
    integer-threshold mask.

    ``flax.linen.Dropout`` draws a full uniform-f32 field — 32 random bits
    per element, which XLA materializes and relays as a u32 tensor (~0.4
    ms/step at the decoder-tail shapes on v5e).  Comparing raw u16 bits
    against ``round(rate * 2^16)`` halves the generated bits and keeps the
    compare in integers; the effective drop probability differs from
    ``rate`` by at most 2^-17.  Keeps torch's exact 1/(1-rate) scaling.
    """
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool,
                 pad_lanes: int = 0) -> jnp.ndarray:
        """``pad_lanes=blk``: draw the random field as if the trailing axis
        were padded to ``blk`` lanes and slice off the pad.  This makes the
        mask of a natural (..., C) tensor agree element-for-element with the
        mask its channel-padded-columns twin draws (a (..., G, C) tensor and
        its (..., G*blk) cols layout consume the same flat bit stream —
        jax.random.bits is shape-agnostic up to reshape), so the fused-tail
        carry and the XLA reference path realize the SAME dropout.  Only the
        reference path pays the slice; the cols path draws at its physical
        shape."""
        if deterministic or self.rate == 0.0:
            return x
        thresh = int(round(self.rate * 65536.0))
        if thresh >= 65536:
            # rate within 2^-17 of 1.0: the u16 threshold would WRAP to 0
            # and keep everything at an infinite scale — match nn.Dropout's
            # rate=1 semantics (all zeros) instead.
            return jnp.zeros_like(x)
        if pad_lanes:
            shape = x.shape[:-1] + (pad_lanes,)
            bits = jax.random.bits(self.make_rng('dropout'), shape, jnp.uint16)
            bits = bits[..., :x.shape[-1]]
        else:
            bits = jax.random.bits(self.make_rng('dropout'), x.shape, jnp.uint16)
        scale = jnp.asarray(1.0 / (1.0 - self.rate), x.dtype)
        return jnp.where(bits >= jnp.uint16(thresh), x * scale,
                         jnp.zeros((), x.dtype))
