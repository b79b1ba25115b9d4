"""Pallas TPU kernel: fused eval tail — final ConvT + bias + CE + argmax +
metric histograms, logits-free.

The evaluation hot loop (the `benchmark` command and the training-loop
validator, /root/reference/command_handlers/benchmark.py:59-79) needs five
things from the logits: the CE loss, the argmax class map, and the three
mIoU histogram vectors (+ the accuracy counts).  Left to XLA the grouped
logits tensor (318 MB bf16 at the reference shapes) is materialized by the
final ConvT and then re-read by the softmax, the argmax's max/first-match
pair and the histogram one-hot reductions — ~8 ms of the 19 ms eval step on
v5e, plus the boundary relayout copies between them.

This kernel reuses the training tail's machinery (fused_tail.py: same
channel-padded-columns activation, same block-diagonal packed weight, same
g16-major uint8 label operand) but is forward-only and single-pass: each
grid step streams one activation tile into VMEM, expands it to transposed
logits on the MXU, and accumulates

* the CE sum + valid-pixel count (identical math to the train kernel),
* the (num_classes,) areas of prediction / intersection / target — the
  exact reference mIoU histogram semantics (metrics/device.py::
  batch_histograms: prediction and intersection count valid-label pixels
  only, target counts in-range labels),
* the correct-pixel count for the Accuracy metric,

and writes only the argmaxed class map — int32, in the SAME g16-major
(16, N) layout as the label operand — back to HBM.  Ties in the argmax
resolve to the lowest class index, matching metrics/device.py::
argmax_lastdim (and jnp/np/torch argmax).

Everything is validated against the XLA composition in interpret mode
(tests/test_pallas_eval_tail.py) and end-to-end through make_eval_step's
grouped-vs-plain equivalence test (tests/test_eval_step_mask.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_tail import (_BLK, _G, _NPOS, _NCOLS, _NROWS, _row_tile,
                         _tile_logits_t, _specs, _ce_terms,
                         pack_tail_params_cols)


def _eval_kernel(x_ref, wp_ref, bp_ref, lt_ref, pred_ref, ce_ref, cnt_ref,
                 hp_ref, hi_ref, ht_ref, cor_ref, *, ignore_label,
                 num_classes):
    # NB: intermediates stay rank >= 2 (Mosaic layout.h constraint), except
    # the size-1 axis-(0,2) sums the train kernel already compiles.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ce_ref[:] = jnp.zeros_like(ce_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        hp_ref[:] = jnp.zeros_like(hp_ref)
        hi_ref[:] = jnp.zeros_like(hi_ref)
        ht_ref[:] = jnp.zeros_like(ht_ref)
        cor_ref[:] = jnp.zeros_like(cor_ref)

    logits = _tile_logits_t(x_ref[:], wp_ref, bp_ref)    # (_NROWS, R) f32
    r = logits.shape[1]
    nb = _G * _NPOS
    lg = logits.reshape(nb, _BLK, r)
    lab = lt_ref[:].astype(jnp.int32).reshape(nb, 1, r)
    classes = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)

    # CE: the train forward kernel's implementation, shared (fused_tail.py::
    # _ce_terms) so train/eval CE cannot drift apart; m is the per-pixel
    # class max it already computed.
    nll, valid, m = _ce_terms(lg, lab, bp_ref, ignore_label)
    ce_acc = jnp.sum(nll, axis=(0, 2))
    validf = valid.astype(jnp.float32)
    cnt_acc = jnp.sum(validf, axis=(0, 2))

    # Argmax over the class (sublane) axis; pad classes carry bias -1e30 so
    # they never win.  First-maximal tie-break, like argmax_lastdim.  The
    # _BLK sentinel survives only when NOTHING equals the max (all-NaN logits
    # from a diverged checkpoint); clamp it into class range exactly like
    # argmax_lastdim does (metrics/device.py), instead of emitting class 32.
    pred = jnp.min(jnp.where(lg == m, classes, _BLK), axis=1, keepdims=True)
    pred = jnp.minimum(pred, num_classes - 1)

    # Histogram areas (reference mIoU semantics, metrics/device.py):
    #   pred / intersection restricted to valid-label pixels, target to
    #   in-range labels.  One-hot on the class axis; counts accumulate in
    #   f32 (exact for < 2^24 pixels per class per batch — the reference
    #   shapes have 8.4M pixels total).
    pred_oh = (classes == pred).astype(jnp.float32)      # (16, _BLK, R)
    agree = (pred == lab).astype(jnp.float32) * validf   # (16, 1, R)
    in_range = (lab < num_classes).astype(jnp.float32)
    t_oh = (classes == lab).astype(jnp.float32)

    def _per_class(x3):
        # (16, _BLK, R) -> (_BLK, 1) without a rank-1 intermediate.
        return jnp.sum(jnp.sum(x3, axis=2, keepdims=True), axis=0)

    hp_acc = _per_class(pred_oh * validf)
    hi_acc = _per_class(pred_oh * agree)
    ht_acc = _per_class(t_oh * in_range)
    cor_acc = jnp.sum(agree, axis=(0, 2))

    pred_ref[:] = pred.reshape(nb, r)
    ce_ref[:] = ce_ref[:] + jnp.broadcast_to(ce_acc.reshape(1, 1), ce_ref.shape)
    cnt_ref[:] = cnt_ref[:] + jnp.broadcast_to(cnt_acc.reshape(1, 1), cnt_ref.shape)
    cor_ref[:] = cor_ref[:] + jnp.broadcast_to(cor_acc.reshape(1, 1), cor_ref.shape)
    hp_ref[:] = hp_ref[:] + hp_acc
    hi_ref[:] = hi_ref[:] + hi_acc
    ht_ref[:] = ht_ref[:] + ht_acc


def convt_cols_eval(x, wp, bp, labs_t, ignore_label, num_classes,
                    interpret=False):
    """Single-pass eval tail over the cols activation.

    Args match fused_tail.convt_cols_ce_sum.  Returns
    ``(pred_t, ce_sum, count, area_pred, area_inter, area_target, correct)``
    — pred_t (16, N) int32 in the label operand's g16-major layout, scalars
    f32, areas (num_classes,) i32.
    """
    n, c = x.shape
    assert c == _NCOLS, "cols activation must have {} columns".format(_NCOLS)
    r = _row_tile(n)
    labs_t = labs_t.astype(jnp.uint8)
    scalar_spec = pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((_BLK, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    pred, ce, cnt, hp, hi, ht, cor = pl.pallas_call(
        functools.partial(_eval_kernel, ignore_label=ignore_label,
                          num_classes=num_classes),
        grid=(n // r,),
        in_specs=_specs(r),
        out_specs=[
            pl.BlockSpec((_G * _NPOS, r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec, hist_spec, hist_spec, hist_spec,
            scalar_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_G * _NPOS, n), jnp.int32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((_BLK, 1), jnp.float32),
            jax.ShapeDtypeStruct((_BLK, 1), jnp.float32),
            jax.ShapeDtypeStruct((_BLK, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * _NCOLS * _NROWS + 80 * n * _NPOS * _G * _BLK,
            bytes_accessed=(x.size * x.dtype.itemsize + labs_t.size
                            + 4 * _G * _NPOS * n),
            transcendentals=n * _NPOS * _G * _BLK),
        interpret=interpret,
    )(x, wp, bp, labs_t)
    areas = tuple(v[:num_classes, 0].astype(jnp.int32) for v in (hp, hi, ht))
    return (pred, ce[0, 0], cnt[0, 0]) + areas + (cor[0, 0],)


def fused_convt2_eval(y1, weight, bias, labs_t, ignore_label, num_classes,
                      interpret=False):
    """High-level eval tail on the (B, H, W, 128) cols carry.

    Returns ``(pred_t, ce_mean, areas, (correct, valid))`` with the exact
    semantics of the XLA composition: ``cross_entropy_loss`` masked mean,
    ``batch_histograms`` areas, ``batch_accuracy_counts`` counts, and the
    argmax class map as (16, B*H*W) int32 g16-major.
    """
    b, h, w, c = y1.shape
    x = y1.reshape(b * h * w, c)
    wp, bp = pack_tail_params_cols(weight, bias)
    pred, ce_sum, count, hp, hi, ht, cor = convt_cols_eval(
        x, wp, bp, labs_t, ignore_label, num_classes, interpret)
    ce = jnp.where(count > 0, ce_sum / jnp.maximum(count, 1.0), 0.0)
    return pred, ce, (hp, hi, ht), (cor.astype(jnp.int32),
                                    count.astype(jnp.int32))
