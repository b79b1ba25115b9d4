"""Pallas TPU kernel: fused final-ConvTranspose + bias + cross-entropy.

The training hot loop's last layer is ``ConvTranspose2d(19, 19, k=2, s=2)``
followed by pixel-wise CE (/root/reference/models/DSRL.py:66-69 +
command_handlers/train_or_resume.py:435).  In grouped layout that ConvT is a
(19 -> 4*19) matmul whose output IS the logits tensor — (B, 128, 256, 16, 19)
bf16 = 319 MB at the reference recipe's shapes.  Left to XLA, that tensor is
materialized and re-laid-out repeatedly: the forward bias add, the CE
log-softmax (f32), the CE backward, the bias gradient and the two ConvT
gradient matmuls each make full-size passes — ~14 ms/step measured on v5e.

This kernel never materializes the logits.  Each grid step streams a tile of
the PRE-ConvT activation (the 4x-smaller tensor) into VMEM, runs the
(19 -> 4*19) matmul on the MXU, computes the four pixels' log-softmax NLL,
and accumulates two scalars (CE sum, valid count).  The backward recomputes
the tile's logits, forms ``(softmax - onehot) * scale`` in place, and
contracts it immediately into dX (MXU), dW and db — HBM traffic is two
reads of X + one write of dX instead of ~8 full logits passes.

Data layout: the in-kernel logits are TRANSPOSED — pixels ride the 128-wide
lane axis and classes the sublane axis, padded per 2x2-position block to 32
sublanes (an aligned slice boundary).  The naive pixels-on-sublanes layout
leaves 19/128 lanes active in every vector op and measured 2x SLOWER than
the XLA composition it replaces (12 + 13 ms/step fwd+bwd); this layout runs
the element-wise math at full lane width.  Padded weight rows are zero and
padded bias rows -1e30, so padded "classes" contribute exp(-inf) = 0 to
every softmax without branching.  The ACTIVATION however streams in its
natural (pixels, C) orientation and the gradient streams back out the same
way — the MXU dots absorb the orientation change, where an explicit XLA
transpose of the 80 MB operand cost ~2.6 ms/step.  Labels arrive as a
(4, pixels) uint8 array built directly from the raw label map
(ops/conv.py::group_labels_positions_t — build it OUTSIDE the train step's
jit, see there).

The four "pixels" per activation row are the ConvT's 2x2 output positions:
block k = kh*2+kw holds ``x @ W[:, :, kh, kw] + b``, matching
ops/conv.py::conv_transpose_2x2_stride2_grouped's nested group order.

Wired through ``jax.custom_vjp``; validated against the XLA composition in
interpret mode on CPU and compiled on TPU (tests/test_pallas_tail.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 32          # sublanes per 2x2-position class block (19 real + pad)
_NPOS = 4          # ConvT(2,2) output positions per input pixel
_MAX_COL_TILE = 2048

_NEG = -1e30       # bias pad: exp(_NEG - m) == 0 exactly in f32


def _col_tile(m: int) -> int:
    """Largest lane-aligned tile that divides the pixel count."""
    r = min(_MAX_COL_TILE, m)
    while m % r:
        r //= 2
    if r < 128:
        raise ValueError(
            "fused tail kernel needs pixel count divisible by 128, got {}".format(m))
    return r


def _tile_logits_t(x, wp_ref, bp_ref):
    """(R, C) natural activation tile -> (4*_BLK, R) f32 transposed logits."""
    wp = wp_ref[:].astype(x.dtype)              # (4*_BLK, C)
    y = jax.lax.dot_general(wp, x, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + bp_ref[:]                         # bias (4*_BLK, 1) broadcasts


def _fwd_kernel(x_ref, wp_ref, bp_ref, lt_ref, ce_ref, cnt_ref, *, ignore_label):
    # NB: every intermediate stays rank >= 2 — Mosaic's vector layouts reject
    # rank-1 values (layout.h "arr.size() >= layout_rank" check).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ce_ref[:] = jnp.zeros_like(ce_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    logits = _tile_logits_t(x_ref[:], wp_ref, bp_ref)    # (4*_BLK, R) f32
    r = logits.shape[1]
    # All four position blocks at once: a sublane-aligned (4, _BLK, R) view.
    lg = logits.reshape(_NPOS, _BLK, r)
    lab = lt_ref[:].astype(jnp.int32).reshape(_NPOS, 1, r)
    m = jnp.max(lg, axis=1, keepdims=True)               # (4, 1, R)
    z = jnp.sum(jnp.exp(lg - m), axis=1, keepdims=True)
    classes = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    picked = jnp.sum(jnp.where(classes == lab, lg, 0.0), axis=1,
                     keepdims=True)
    valid = lab != ignore_label
    nll = jnp.where(valid, m + jnp.log(z) - picked, 0.0)  # (4, 1, R)
    ce_acc = jnp.sum(nll, axis=(0, 2))                    # (1,)
    cnt_acc = jnp.sum(valid.astype(jnp.float32), axis=(0, 2))
    ce_ref[:] = ce_ref[:] + jnp.broadcast_to(ce_acc.reshape(1, 1), ce_ref.shape)
    cnt_ref[:] = cnt_ref[:] + jnp.broadcast_to(cnt_acc.reshape(1, 1), cnt_ref.shape)


def _bwd_kernel(x_ref, wp_ref, bp_ref, lt_ref, s_ref, dx_ref, dwp_ref,
                dbp_ref, *, ignore_label):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)

    x = x_ref[:]                                         # (R, C)
    logits = _tile_logits_t(x, wp_ref, bp_ref)           # (4*_BLK, R) f32
    r = logits.shape[1]
    scale = s_ref[0, 0]                                  # d(ce_sum) cotangent
    lg = logits.reshape(_NPOS, _BLK, r)
    lab = lt_ref[:].astype(jnp.int32).reshape(_NPOS, 1, r)
    m = jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg - m)                                  # pad rows: exactly 0
    p = e / jnp.sum(e, axis=1, keepdims=True)
    classes = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    onehot = (classes == lab).astype(jnp.float32)
    valid = (lab != ignore_label).astype(jnp.float32)
    dlogits = ((p - onehot) * (scale * valid)).reshape(_NPOS * _BLK, r)
    dlb = dlogits.astype(x.dtype)
    wp = wp_ref[:].astype(x.dtype)
    # dX = dlogits^T @ W_p — contract the padded class axis (pad rows of wp
    # are zero, so they contribute nothing); writes in natural orientation.
    dx_ref[:] = jax.lax.dot_general(
        dlb, wp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dW_p = dlogits @ X, accumulated across tiles in f32.
    dwp_ref[:] = dwp_ref[:] + jax.lax.dot_general(
        dlb, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbp_ref[:] = dbp_ref[:] + jnp.sum(dlogits, axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def convt_corners_ce_sum(x, wp, bp, labs_t, ignore_label, interpret=False):
    """(CE sum, valid count) over the 4-position logits of every pixel.

    Args:
      x: (M, C) activation rows (model dtype), M % 128 == 0.
      wp: (4*_BLK, C) f32 padded-transposed ConvT weight —
        ``wp[_BLK*k + cout, cin] = W[cin, cout, k//2, k%2]``, pad rows zero.
      bp: (4*_BLK, 1) f32 bias per padded class row, pad rows -1e30.
      labs_t: (4, M) uint8 labels per 2x2 position
        (ops/conv.py::group_labels_positions_t); ``ignore_label`` skips.
    """
    return _fwd_impl(x, wp, bp, labs_t, ignore_label, interpret)


def _specs(c, r):
    return [
        pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_NPOS * _BLK, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_NPOS * _BLK, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_NPOS, r), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]


def _fwd_impl(x, wp, bp, labs_t, ignore_label, interpret):
    m, c = x.shape
    r = _col_tile(m)
    labs_t = labs_t.astype(jnp.uint8)
    ce, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, ignore_label=ignore_label),
        grid=(m // r,),
        in_specs=_specs(c, r),
        out_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * _NPOS * _BLK + 40 * m * _NPOS * _BLK,
            bytes_accessed=x.size * x.dtype.itemsize + labs_t.size,
            transcendentals=m * _NPOS * _BLK),
        interpret=interpret,
    )(x, wp, bp, labs_t)
    return ce[0, 0], cnt[0, 0]


def _vjp_fwd(x, wp, bp, labs_t, ignore_label, interpret):
    out = _fwd_impl(x, wp, bp, labs_t, ignore_label, interpret)
    return out, (x, wp, bp, labs_t)


def _vjp_bwd(ignore_label, interpret, residuals, cotangents):
    x, wp, bp, labs_t = residuals
    g_sum, _g_cnt = cotangents        # count depends only on int labels
    m, c = x.shape
    r = _col_tile(m)
    labs_t = labs_t.astype(jnp.uint8)
    scale = jnp.asarray(g_sum, jnp.float32).reshape(1, 1)
    dx, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, ignore_label=ignore_label),
        grid=(m // r,),
        in_specs=_specs(c, r) + [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NPOS * _BLK, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NPOS * _BLK, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, c), x.dtype),
                   jax.ShapeDtypeStruct((_NPOS * _BLK, c), jnp.float32),
                   jax.ShapeDtypeStruct((_NPOS * _BLK, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * m * c * _NPOS * _BLK + 40 * m * _NPOS * _BLK,
            bytes_accessed=2 * x.size * x.dtype.itemsize + labs_t.size,
            transcendentals=m * _NPOS * _BLK),
        interpret=interpret,
    )(x, wp, bp, labs_t, scale)
    dlabs = np.zeros(labs_t.shape, jax.dtypes.float0)
    return dx, dwp.astype(wp.dtype), dbp.astype(bp.dtype), dlabs


convt_corners_ce_sum.defvjp(_vjp_fwd, _vjp_bwd)


def pack_tail_params(weight, bias):
    """ConvT IOHW weight (C, C, 2, 2) + bias (C,) -> (wp, bp) kernel operands.

    Differentiable jnp ops, so AD maps the kernel's dwp/dbp back to the
    module's parameter shapes automatically."""
    cin, cout = weight.shape[0], weight.shape[1]
    wt = jnp.transpose(weight, (2, 3, 1, 0)).reshape(_NPOS, cout, cin)
    wp = jnp.pad(wt, ((0, 0), (0, _BLK - cout), (0, 0))).reshape(_NPOS * _BLK, cin)
    bt = jnp.pad(jnp.broadcast_to(bias[None, :], (_NPOS, cout)),
                 ((0, 0), (0, _BLK - cout)), constant_values=_NEG)
    return wp, bt.reshape(_NPOS * _BLK, 1)


def fused_convt2_ce_mean(y1, weight, bias, seg_grouped, ignore_label,
                         interpret=False):
    """Mean CE over valid pixels of the grouped final ConvT, logits-free.

    Exactly ``cross_entropy_loss(conv_transpose_2x2_stride2_grouped(y1, W, b),
    group-matched labels, ignore_label)`` — same masking and mean semantics
    as losses/cross_entropy.py (torch CrossEntropyLoss ``reduction='mean'``
    with ignore_index).

    Args:
      y1: (B, H, W, G, C) pre-ConvT grouped activation.
      weight: (C, C, 2, 2) torch-IOHW ConvT weight.
      bias: (C,) bias.
      seg_grouped: (B, H, W, 4G) labels in nested grouped order
        (ops/conv.py::group_labels of the full-resolution map).
    """
    b, h, w, g, c = y1.shape
    m = b * h * w * g
    x = y1.reshape(m, c)
    wp, bp = pack_tail_params(weight, bias)
    labs_t = seg_grouped.reshape(m, _NPOS).T.astype(jnp.uint8)
    ce_sum, count = convt_corners_ce_sum(x, wp, bp, labs_t,
                                         ignore_label, interpret)
    return jnp.where(count > 0, ce_sum / jnp.maximum(count, 1.0), 0.0)
