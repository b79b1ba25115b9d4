"""Resize / pooling primitives with exact PyTorch numerics, NHWC layout.

The reference leans on ``torch.nn.functional.interpolate`` with
``align_corners=True`` for every bilinear resize (ASPP global branch
/root/reference/models/modules/ASPP.py:41, the decoder's UpsamplingBilinear2d
/root/reference/models/DSRL.py:53,163, and the data pipeline's
JointScaledImage /root/reference/models/transforms/JointScaledImage.py:28-30)
and on ``mode='nearest'`` for segmentation maps.  PyTorch's align-corners
semantics differ from ``jax.image.resize``, and a silent mismatch costs mIoU,
so these are implemented from scratch:

* source coordinates are computed **at trace time** with numpy (shapes are
  static under jit), producing constant gather indices and lerp weights;
* the kernel itself is two separable gather+lerp passes — O(1) work per
  output element, fully fusable by XLA, no host round-trips.
"""

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _linear_indices_weights(in_size: int, out_size: int):
    """Indices/weights for 1-D align_corners=True linear interpolation.

    PyTorch maps output j to source position j*(I-1)/(O-1) (and to 0 when
    O == 1), then lerps between floor and ceil.
    """
    if out_size == 1 or in_size == 1:
        src = np.zeros(out_size, dtype=np.float64)
    else:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    frac = (src - i0).astype(np.float32)
    return i0, i1, frac


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int):
    # PyTorch 'nearest' picks floor(j * I/O).
    src = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(src.astype(np.int32), 0, in_size - 1)


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear align_corners=True resize of an NHWC (or HWC / NHWC...) array.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=True)`` exactly in f32.  Interpolation runs in the input's
    dtype (bf16-safe: weights are f32; accumulate in f32 then cast back).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    *lead, in_h, in_w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    if in_h != out_h:
        i0, i1, frac = _linear_indices_weights(in_h, out_h)
        w = frac.reshape((1,) * len(lead) + (out_h, 1, 1))
        xf = jnp.take(xf, i0, axis=-3) * (1.0 - w) + jnp.take(xf, i1, axis=-3) * w
    if in_w != out_w:
        i0, i1, frac = _linear_indices_weights(in_w, out_w)
        w = frac.reshape((1,) * len(lead) + (1, out_w, 1))
        xf = jnp.take(xf, i0, axis=-2) * (1.0 - w) + jnp.take(xf, i1, axis=-2) * w
    return xf.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int):
    """Dense (out, in) align-corners interpolation matrix (2 nonzeros/row)."""
    i0, i1, frac = _linear_indices_weights(in_size, out_size)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - frac)
    np.add.at(m, (rows, i1), frac)
    return m


def resize_bilinear_matmul(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear align_corners=True resize expressed as two small matmuls.

    Numerically identical to :func:`resize_bilinear_align_corners` in f32
    (each output is the same two-term lerp), but lowers to MXU matmuls whose
    TRANSPOSE is also a matmul — the gather formulation's backward is a
    scatter-add, which TPUs execute poorly.  Used on the model's in-graph
    upsampling paths (ASPP x4, decoder x2) where gradients flow.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    *lead, in_h, in_w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        mh = jnp.asarray(_interp_matrix(in_h, out_h))
        xf = jnp.einsum('oh,...hwc->...owc', mh, xf)
    if in_w != out_w:
        mw = jnp.asarray(_interp_matrix(in_w, out_w))
        xf = jnp.einsum('pw,...hwc->...hpc', mw, xf)
    return xf.astype(orig_dtype)


def resize_bilinear_matmul_hw(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """:func:`resize_bilinear_matmul` for channel-PLANAR input — spatial
    dims are the LAST two (..., H, W), the Pallas photometric kernel's
    emission layout (ops/pallas/augment_post.py)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    *lead, in_h, in_w = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        mh = jnp.asarray(_interp_matrix(in_h, out_h))
        xf = jnp.einsum('oh,...hw->...ow', mh, xf)
    if in_w != out_w:
        mw = jnp.asarray(_interp_matrix(in_w, out_w))
        xf = jnp.einsum('pw,...hw->...hp', mw, xf)
    return xf.astype(orig_dtype)


def resize_nearest(x: jnp.ndarray, out_hw, spatial_axes=(-3, -2)) -> jnp.ndarray:
    """Nearest-neighbor resize matching ``torch`` ``mode='nearest'``.

    Works on any rank; ``spatial_axes`` selects the (H, W) axes so it can
    serve both NHWC images and (..., H, W) label maps.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    ax_h = spatial_axes[0] % x.ndim
    ax_w = spatial_axes[1] % x.ndim
    in_h, in_w = x.shape[ax_h], x.shape[ax_w]
    if in_h != out_h:
        x = jnp.take(x, _nearest_indices(in_h, out_h), axis=ax_h)
    if in_w != out_w:
        x = jnp.take(x, _nearest_indices(in_w, out_w), axis=ax_w)
    return x


def avg_pool_nhwc(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """AvgPool2d(window) with stride == window and no padding (torch default,
    used by FALoss /root/reference/models/losses/FALoss.py:23-24).

    Remainder rows/cols are dropped (floor semantics) — then the pool is a
    pure reshape+mean, which XLA fuses into neighboring ops with no windowed
    reduction at all.
    """
    n, h, w, c = x.shape
    oh, ow = h // window, w // window
    x = x[:, :oh * window, :ow * window, :]
    x = x.reshape(n, oh, window, ow, window, c)
    return x.mean(axis=(2, 4))


def global_avg_pool_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1,1)) equivalent: mean over H, W keeping dims."""
    return x.mean(axis=(1, 2), keepdims=True)
