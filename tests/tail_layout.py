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


def ungroup_g16t_sample(x):
    """(16, h, w) g16-major (row ((i*2+j)*2+k)*2+l, the label/eval-tail
    operand layout of ops/conv.py::group_labels_g16_t) -> (4h, 4w) full-res
    for ONE sample, in numpy.  Full-res pixel (4h + 2i + k, 4w + 2j + l)."""
    import numpy as np
    x = np.asarray(x)
    g, h, w = x.shape
    assert g == 16, "expected g16-major sample, got {}".format(x.shape)
    x = x.reshape(2, 2, 2, 2, h, w)            # (i, j, k, l, h, w)
    x = x.transpose(4, 0, 2, 5, 1, 3)          # (h, i, k, w, j, l)
    return np.ascontiguousarray(x.reshape(4 * h, 4 * w))
