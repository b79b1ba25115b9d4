"""Pallas TPU kernel: fused final-ConvTranspose + bias + cross-entropy.

The training hot loop's last layer is ``ConvTranspose2d(19, 19, k=2, s=2)``
followed by pixel-wise CE (/root/reference/models/DSRL.py:66-69 +
command_handlers/train_or_resume.py:435).  In grouped layout that ConvT is a
(19 -> 4*19) matmul whose output IS the logits tensor — 319 MB bf16 at the
reference recipe's shapes.  Left to XLA, that tensor is materialized and
re-laid-out repeatedly: the forward bias add, the CE log-softmax (f32), the
CE backward, the bias gradient and the two ConvT gradient matmuls each make
full-size passes — ~14 ms/step measured on v5e.

This kernel never materializes the logits.  Each grid step streams a tile of
the PRE-ConvT activation (the 4x-smaller tensor) into VMEM, runs the
expanding matmul on the MXU, computes the four output pixels' log-softmax
NLL per activation pixel, and accumulates two scalars (CE sum, valid
count).  The backward recomputes the tile's logits, forms
``(softmax - onehot) * scale`` in place, and contracts it immediately into
dX (MXU), dW and db — HBM traffic is two reads of X + one write of dX
instead of ~8 full logits passes.

Data layout (round 3): the activation arrives in CHANNEL-PADDED-COLUMNS
orientation — (N, 128) where column ``g*32 + ci`` holds channel ci of the
first-ConvT 2x2 position g, pad columns zero
(ops/conv.py::conv_transpose_2x2_stride2_cols).  The trailing 128 is
exactly one TPU lane tile, so the operand's default layout IS its logical
size; the previous natural (rows, 19) operand forced a default layout that
pads 19 lanes to 128 — 6.7x the bytes — and XLA charged ~2.7 ms/step of
re-layout copies at the kernel boundary moving between it and the packed
layouts the surrounding fusions prefer.  The ConvT weight becomes a
block-diagonal (512, 128) operand: out-row block (g, p) of 32 (19 real
classes + pad) contracts only input-column block g — one K=128 MXU dot per
tile, the same hardware time as the old K=19 dot (which padded K to 128
internally anyway).  In-kernel logits stay TRANSPOSED — pixels ride the
128-wide lane axis, classes the sublane axis in 32-aligned blocks; the
pixels-on-sublanes alternative measured 2x slower than the XLA composition
it replaces.  Padded weight rows are zero and padded bias rows -1e30, so
padded "classes" contribute exp(-inf) = 0 to every softmax without
branching.  Labels arrive as a (16, N) uint8 array — row ``g*4 + p`` is
full-res nested group g16 — built by the C++ data plane
(native/dataplane.cpp::dp_labels_g16_t) or ops/conv.py::group_labels_g16_t
OUTSIDE the train step's jit (see there).

Wired through ``jax.custom_vjp``; validated against the XLA composition in
interpret mode on CPU and compiled on TPU (tests/test_pallas_tail.py,
test_pallas_tail_tpu.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 32          # classes per (g, p) block (19 real + pad), sublane-aligned
_G = 4             # first-ConvT 2x2 positions carried in the input columns
_NPOS = 4          # final-ConvT 2x2 output positions per input pixel
_NCOLS = _G * _BLK            # input columns  = 128 = one lane tile
_NROWS = _G * _NPOS * _BLK    # logits rows    = 512 = 16 class blocks
# Activation rows per grid step; env-overridable so hardware sweeps don't
# edit code (values must keep the VMEM working set — ~r*6.5 KB fwd,
# ~r*13 KB bwd — under budget, and r must divide the pixel count).
_MAX_ROW_TILE = int(__import__('os').environ.get('DSRL_TPU_TAIL_ROW_TILE',
                                                 '512'))

_NEG = -1e30       # bias pad: exp(_NEG - m) == 0 exactly in f32


def _row_tile(n: int) -> int:
    """Largest sublane-aligned (multiple-of-8) tile <= _MAX_ROW_TILE that
    divides the pixel count — searched directly rather than by halving the
    cap, so a non-power-of-two override (e.g. 768) still lands on the best
    legal divisor of a power-of-two pixel count instead of collapsing."""
    if n % 8:
        raise ValueError(
            "fused tail kernel needs pixel count divisible by 8, got {}".format(n))
    for r in range(min(_MAX_ROW_TILE, n) // 8 * 8, 0, -8):
        if n % r == 0:
            return r
    return 8


def _tile_logits_t(x, wp_ref, bp_ref):
    """(R, 128) cols activation tile -> (_NROWS, R) f32 transposed logits."""
    wp = wp_ref[:].astype(x.dtype)              # (_NROWS, _NCOLS) block-diag
    y = jax.lax.dot_general(wp, x, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + bp_ref[:]                         # bias (_NROWS, 1) broadcasts


def _real_class_rows(bp_ref, shape):
    """(nb, _BLK, 1) mask of REAL class rows — pad rows are marked by their
    ``_NEG`` bias.  A label in [num_classes, _BLK) must match nothing: the
    XLA CE's one-hot (built over the real classes only) contracts such a
    label to a picked logit of 0, whereas matching a pad row would pick its
    -1e30 bias and blow the NLL up to ~1e30."""
    nb, blk, _ = shape
    return bp_ref[:].reshape(nb, blk, 1) != _NEG


def _ce_terms(lg, lab, bp_ref, ignore_label):
    """Per-pixel masked-CE terms — THE implementation shared by the train
    forward kernel and the eval kernel (eval_tail.py), so train/eval CE
    cannot drift apart.  Matches losses/cross_entropy.py's one-hot
    contraction exactly, including out-of-range non-ignore labels (see
    :func:`_real_class_rows`).

    Returns ``(nll, valid, m)``: (nb, 1, R) f32 NLL (0 where invalid), the
    bool valid mask, and the per-pixel class max (reused by eval's argmax)."""
    m = jnp.max(lg, axis=1, keepdims=True)               # (nb, 1, R)
    z = jnp.sum(jnp.exp(lg - m), axis=1, keepdims=True)
    classes = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    match = (classes == lab) & _real_class_rows(bp_ref, lg.shape)
    picked = jnp.sum(jnp.where(match, lg, 0.0), axis=1, keepdims=True)
    valid = lab != ignore_label
    nll = jnp.where(valid, m + jnp.log(z) - picked, 0.0)
    return nll, valid, m


def _fwd_kernel(x_ref, wp_ref, bp_ref, lt_ref, ce_ref, cnt_ref, *, ignore_label):
    # NB: every intermediate stays rank >= 2 — Mosaic's vector layouts reject
    # rank-1 values (layout.h "arr.size() >= layout_rank" check).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ce_ref[:] = jnp.zeros_like(ce_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    logits = _tile_logits_t(x_ref[:], wp_ref, bp_ref)    # (_NROWS, R) f32
    r = logits.shape[1]
    # All 16 (g, p) blocks at once: a sublane-aligned (16, _BLK, R) view.
    nb = _G * _NPOS
    lg = logits.reshape(nb, _BLK, r)
    lab = lt_ref[:].astype(jnp.int32).reshape(nb, 1, r)
    nll, valid, _ = _ce_terms(lg, lab, bp_ref, ignore_label)
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

    x = x_ref[:]                                         # (R, _NCOLS)
    logits = _tile_logits_t(x, wp_ref, bp_ref)           # (_NROWS, R) f32
    r = logits.shape[1]
    scale = s_ref[0, 0]                                  # d(ce_sum) cotangent
    nb = _G * _NPOS
    lg = logits.reshape(nb, _BLK, r)
    lab = lt_ref[:].astype(jnp.int32).reshape(nb, 1, r)
    m = jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg - m)                                  # pad rows: exactly 0
    p = e / jnp.sum(e, axis=1, keepdims=True)
    classes = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    # Pad-row mask for the same reason as the forward's picked-logit mask
    # (_real_class_rows): an out-of-range label's one-hot must be all-zero,
    # exactly like the XLA CE's one-hot over the real classes.  (Without it
    # the stray -1 lands on a pad row whose dW/db/dX contributions are
    # structurally discarded anyway, but keep the math identical.)
    onehot = ((classes == lab) & _real_class_rows(bp_ref, lg.shape)
              ).astype(jnp.float32)
    valid = (lab != ignore_label).astype(jnp.float32)
    dlogits = ((p - onehot) * (scale * valid)).reshape(_NROWS, r)
    dlb = dlogits.astype(x.dtype)
    wp = wp_ref[:].astype(x.dtype)
    # dX = dlogits^T @ W_p — contract the logits-row axis (off-diagonal
    # blocks of wp are zero, so each input column block only receives its
    # own position's gradient); writes in the cols orientation.
    dx_ref[:] = jax.lax.dot_general(
        dlb, wp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dW_p = dlogits @ X, accumulated across tiles in f32.
    dwp_ref[:] = dwp_ref[:] + jax.lax.dot_general(
        dlb, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbp_ref[:] = dbp_ref[:] + jnp.sum(dlogits, axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def convt_cols_ce_sum(x, wp, bp, labs_t, ignore_label, interpret=False):
    """(CE sum, valid count) over the 4-position logits of every pixel.

    Args:
      x: (N, 128) cols activation (model dtype), N % 8 == 0 — column
        ``g*32 + ci`` is channel ci of first-ConvT position g, pads zero.
      wp: (_NROWS, _NCOLS) = (512, 128) f32 block-diagonal weight —
        ``wp[(g*4 + p)*32 + co, g*32 + ci] = W[ci, co, p//2, p%2]``,
        all other entries zero (:func:`pack_tail_params_cols`).
      bp: (512, 1) f32 bias per logits row, pad rows -1e30.
      labs_t: (16, N) uint8 labels, row g*4 + p = nested group g16
        (ops/conv.py::group_labels_g16_t); ``ignore_label`` skips.
    """
    return _fwd_impl(x, wp, bp, labs_t, ignore_label, interpret)


def _specs(r):
    return [
        pl.BlockSpec((r, _NCOLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_NROWS, _NCOLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_NROWS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_G * _NPOS, r), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]


def _fwd_impl(x, wp, bp, labs_t, ignore_label, interpret):
    n, c = x.shape
    assert c == _NCOLS, "cols activation must have {} columns".format(_NCOLS)
    r = _row_tile(n)
    labs_t = labs_t.astype(jnp.uint8)
    ce, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, ignore_label=ignore_label),
        grid=(n // r,),
        in_specs=_specs(r),
        out_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * _NCOLS * _NROWS + 40 * n * _NPOS * _G * _BLK,
            bytes_accessed=x.size * x.dtype.itemsize + labs_t.size,
            transcendentals=n * _NPOS * _G * _BLK),
        interpret=interpret,
    )(x, wp, bp, labs_t)
    return ce[0, 0], cnt[0, 0]


def _vjp_fwd(x, wp, bp, labs_t, ignore_label, interpret):
    out = _fwd_impl(x, wp, bp, labs_t, ignore_label, interpret)
    return out, (x, wp, bp, labs_t)


def _vjp_bwd(ignore_label, interpret, residuals, cotangents):
    x, wp, bp, labs_t = residuals
    g_sum, _g_cnt = cotangents        # count depends only on int labels
    n, _ = x.shape
    r = _row_tile(n)
    labs_t = labs_t.astype(jnp.uint8)
    scale = jnp.asarray(g_sum, jnp.float32).reshape(1, 1)
    dx, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, ignore_label=ignore_label),
        grid=(n // r,),
        in_specs=_specs(r) + [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, _NCOLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NROWS, _NCOLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NROWS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, _NCOLS), x.dtype),
                   jax.ShapeDtypeStruct((_NROWS, _NCOLS), jnp.float32),
                   jax.ShapeDtypeStruct((_NROWS, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * _NCOLS * _NROWS + 40 * n * _NPOS * _G * _BLK,
            bytes_accessed=2 * x.size * x.dtype.itemsize + labs_t.size,
            transcendentals=n * _NPOS * _G * _BLK),
        interpret=interpret,
    )(x, wp, bp, labs_t, scale)
    dlabs = np.zeros(labs_t.shape, jax.dtypes.float0)
    return dx, dwp.astype(wp.dtype), dbp.astype(bp.dtype), dlabs


convt_cols_ce_sum.defvjp(_vjp_fwd, _vjp_bwd)


def pack_tail_params_cols(weight, bias):
    """ConvT IOHW weight (C, C, 2, 2) + bias (C,) -> (wp, bp) block-diagonal
    kernel operands (512, 128) / (512, 1).

    Differentiable jnp ops, so AD maps the kernel's dwp/dbp back to the
    module's parameter shapes automatically — including summing the
    diagonal blocks' weight gradients over g (the eye-broadcast below) and
    discarding the structural-zero off-diagonal/pad gradients (the pads)."""
    cin, cout = weight.shape[0], weight.shape[1]
    wt = jnp.transpose(weight, (2, 3, 1, 0)).reshape(_NPOS, cout, cin)
    w4 = jnp.pad(wt, ((0, 0), (0, _BLK - cout), (0, _BLK - cin)))  # (4,32,32)
    eye = jnp.eye(_G, dtype=weight.dtype)
    # (g, p, co, g', ci): W[p, co, ci] on the g == g' diagonal.
    wp = (eye[:, None, None, :, None] * w4[None, :, :, None, :]).reshape(
        _NROWS, _NCOLS)
    bt = jnp.pad(jnp.broadcast_to(bias[None, :], (_NPOS, cout)),
                 ((0, 0), (0, _BLK - cout)), constant_values=_NEG)
    bp = jnp.broadcast_to(bt.reshape(1, _NPOS * _BLK), (_G, _NPOS * _BLK))
    return wp, bp.reshape(_NROWS, 1)


def fused_convt2_ce_mean(y1, weight, bias, labs_t, ignore_label,
                         interpret=False):
    """Mean CE over valid pixels of the grouped final ConvT, logits-free.

    Exactly ``cross_entropy_loss(conv_transpose_2x2_stride2(ungrouped(y1)),
    full-res labels, ignore_label)`` — same masking and mean semantics as
    losses/cross_entropy.py (torch CrossEntropyLoss ``reduction='mean'``
    with ignore_index).

    Args:
      y1: (B, H, W, 128) pre-ConvT activation in cols layout
        (ops/conv.py::conv_transpose_2x2_stride2_cols).
      weight: (C, C, 2, 2) torch-IOHW ConvT weight.
      bias: (C,) bias.
      labs_t: (16, B*H*W) uint8 labels (ops/conv.py::group_labels_g16_t).
    """
    b, h, w, c = y1.shape
    x = y1.reshape(b * h * w, c)
    wp, bp = pack_tail_params_cols(weight, bias)
    ce_sum, count = convt_cols_ce_sum(x, wp, bp, labs_t,
                                      ignore_label, interpret)
    return jnp.where(count > 0, ce_sum / jnp.maximum(count, 1.0), 0.0)
