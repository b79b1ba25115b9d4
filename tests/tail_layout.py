"""Shared fused-tail layout helper for the CPU and TPU kernel tests.

The channel-padded-columns packing rule lives in ONE place so a future
layout change cannot update one test file and silently leave the other
testing the old carry (it already changed once: position-major -> g16)."""

import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.ops.conv import TAIL_COL_BLOCK


def to_cols(y1):
    """(B, H, W, 4, C) natural grouped -> (B, H, W, 4*TAIL_COL_BLOCK) cols
    carry (ops/conv.py::conv_transpose_2x2_stride2_cols output layout),
    built with differentiable ops so gradient comparisons can run in
    natural shapes."""
    b, h, w, g, c = y1.shape
    y = jnp.pad(y1, ((0, 0),) * 4 + ((0, TAIL_COL_BLOCK - c),))
    return y.reshape(b, h, w, g * TAIL_COL_BLOCK)
