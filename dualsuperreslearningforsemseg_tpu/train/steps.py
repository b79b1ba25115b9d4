"""Jitted train/eval steps.

TPU-first redesign of the reference's per-step hot loop
(/root/reference/command_handlers/train_or_resume.py:404-494), which
performed four ``.item()`` device syncs, host-side NaN asserts and a
full-logits D2H copy per validation batch.  Here:

* forward + losses + backward + SGD update + BN-stat mutation compile into
  ONE XLA program; parameters/momentum are donated so updates are in-place
  in HBM;
* batch inputs are sharded over the ``'data'`` mesh axis, parameters
  replicated — jit inserts the gradient all-reduce over ICI;
* per-step losses stay on device; the engine fetches them one step delayed
  so the host never stalls the pipeline;
* the eval step returns argmax + metric histograms (three 19-vectors) rather
  than logits, so validation transfers ~KBs instead of the (B,19,512,1024)
  tensor;
* stage gating is static: each stage compiles exactly its subgraph, with
  stage-gated loss terms following the reference weighting
  ``CE + w1*MSE + w2*FA`` (train_or_resume.py:435-438).
"""

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from ..losses import cross_entropy_loss, mse_loss, fa_loss
from ..metrics.device import batch_histograms, batch_accuracy_counts, argmax_lastdim
from .optim import sgd_update


def _jit_step(fn):
    """Jit a ``(state, *args) -> (state', losses)`` step with donated state.

    By default the state crosses the boundary with its ~900 small f32 leaves
    packed into one persistent buffer (train/packing.py; measured
    ~2.3 ms/step of per-buffer copy latency on v5e otherwise).
    ``DSRL_TPU_PACK_SMALL=0`` falls back to the plain pytree boundary."""
    if os.environ.get('DSRL_TPU_PACK_SMALL', '1').lower() in ('0', 'false'):
        return jax.jit(fn, donate_argnums=(0,))
    from .packing import wrap_step_with_packing
    return wrap_step_with_packing(fn)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    momentum: Any


def make_train_step(model, stage: int, w1: float, w2: float, momentum: float,
                    weight_decay: float, ignore_label: int = 255,
                    freeze_batch_norm: bool = False, mesh=None, dry_run: bool = False,
                    num_classes: int = 19, post_fn=None, grouped: bool = True,
                    fused_tail: bool = True):
    """Returns jitted fn(state, img_lo, img_hi, seg, lr, rng) ->
    (state, losses-dict of f32 scalars).

    With ``post_fn`` (the device photometric tail from
    data.augment.make_device_post_fn, passed un-jitted), the returned step
    instead takes raw warped uint8 batches — fn(state, imgs_u8, segs_u8, lr,
    rng) — fusing augmentation tail + forward + backward + update into ONE
    XLA program (one dispatch per step; the normalize fuses into the first
    convolution's prologue)."""

    # Spatial sharding forgoes the Pallas tail: its operands are flattened
    # batch-major rows + position-major labels, neither of which shards
    # over an H axis — the grouped XLA tail partitions cleanly instead.
    spatial = mesh is not None and mesh.shape.get('spatial', 1) > 1
    use_fused_tail = fused_tail and grouped and not dry_run and not spatial

    # img_hi may arrive already pixel-unshuffled from the device post fn
    # (data/augment.py::make_device_post_fn(unshuffle_hi=8)): the MSE target
    # permutation then happens at the post emission write instead of as a
    # separate in-loss transpose (+~1 ms/step of copy+transpose at the
    # reference shapes).  Only the grouped pre-shuffle-SISR loss consumes
    # that layout.
    hi_unshuffled = (getattr(post_fn, 'unshuffled_hi_factor', 0)
                     if post_fn is not None else 0)
    if hi_unshuffled:
        assert hi_unshuffled == 8 and grouped and not dry_run, \
            'pre-unshuffled img_hi requires the grouped pre-shuffle SISR loss'

    def _fused_ce(params, y1, labs_t):
        """Final ConvT + CE without materializing the logits
        (ops/pallas/fused_tail.py), sharing the module's parameters; the
        XLA composition at these shapes spends ~14 ms/step re-laying-out
        the 319 MB logits tensor (see the kernel docstring).  Two earlier
        Pallas CE kernels that consumed pre-made logits LOST to XLA (125 /
        171 vs 195 img/s — operand relayout); owning the producing matmul
        is what makes this one pay."""
        from ..ops.pallas.fused_tail import convt_cols_ce_sum, pack_tail_params_cols
        tail = params['SSSR_decoder']['upsample16_pred.6']
        b, h, w, c = y1.shape     # cols carry: (B, H, W, 4*32)
        wp, bp = pack_tail_params_cols(tail['weight'], tail['bias'])
        x = y1.reshape(b * h * w, c)
        from ..utils.backend import resolve_backend
        interpret = resolve_backend() != 'tpu'

        multi_dev = mesh is not None and mesh.devices.size > 1

        def per_shard(x, wp, bp, labs_t):
            s, n = convt_cols_ce_sum(x, wp, bp, labs_t, ignore_label,
                                     interpret)
            if multi_dev:
                s = jax.lax.psum(s, 'data')
                n = jax.lax.psum(n, 'data')
            return s, n

        if multi_dev:
            # Explicit batch-sharding (rows / label columns are batch-major):
            # GSPMD has no partitioning rule for pallas_call and would
            # otherwise gather the full batch onto every device.
            from jax.sharding import PartitionSpec as P
            per_shard = jax.shard_map(per_shard, mesh=mesh,
                                      in_specs=(P('data'), P(), P(),
                                                P(None, 'data')),
                                      out_specs=(P(), P()),
                                      check_vma=False)
        ce_sum, count = per_shard(x, wp, bp, labs_t)
        return jnp.where(count > 0, ce_sum / jnp.maximum(count, 1.0), 0.0)

    def _sp_pin(x):
        """Pin the leading (batch, height) axes of ``x`` to the
        ('data', 'spatial') mesh axes."""
        spec = PartitionSpec('data', 'spatial', *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def loss_fn(params, batch_stats, img_lo, img_hi, seg, rng, labs_t=None):
        # Sharding layout under spatial partitioning: the OS16 trunk
        # (backbone + ASPP) computes batch-sharded with H replicated — its
        # activations are small-spatial, so the duplicated compute is cheap
        # — while the DECODERS, which hold the full-resolution activations
        # that motivate spatial sharding at all, run with H sharded over
        # the 'spatial' axis (model outputs pinned below; GSPMD
        # back-propagates the spec through the decoder convs and inserts
        # the halo exchanges).  The trunk-side pins live INSIDE the model
        # (parallel/spatial.py::pin_trunk, armed by trunk_pinning below):
        # they are a correctness requirement, see that module's docstring.
        variables = {'params': params, 'batch_stats': batch_stats}
        if dry_run:
            # Exercise the full boilerplate without the network
            # (reference --dry-run, train_or_resume.py:420-424).
            b, h, w = seg.shape
            sssr = jax.random.normal(rng, (b, h, w, num_classes))
            sisr = jax.random.normal(rng, img_hi.shape) if stage > 1 else None
            if stage > 2:
                # The reference's dry-run synthesizes transformer outputs and
                # still computes FA on them (train_or_resume.py:422-423), but
                # its hardcoded (B,1,2,2) shape crashes FALoss's AvgPool2d(8)
                # — stage-3 --dry-run never worked there.  Deviation: we
                # synthesize the REAL transformer-output shape (output/8,
                # matching FeatureTransformer's 1x1 stride-8) so the FA
                # boilerplate actually exercises.
                k1, k2 = jax.random.split(jax.random.fold_in(rng, 1))
                sssr_t = jax.random.normal(k1, (b, h // 8, w // 8, 1))
                sisr_t = jax.random.normal(k2, (b, h // 8, w // 8, 1))
            else:
                sssr_t = sisr_t = None
            new_stats = batch_stats
        else:
            # train=True with BN frozen still runs in train mode for dropout;
            # freeze is handled by the model's use_running_average plumbing.
            # grouped=True keeps the SSSR tail in space-to-depth layout (see
            # ops/conv.py): the labels are grouped to match below, and the
            # loss value is mathematically identical.  Under fused_tail the
            # model returns the pre-ConvT activation instead of logits.
            from ..parallel.spatial import trunk_pinning
            with trunk_pinning(mesh if spatial else None):
                outs, mutated = model.apply(
                    variables, img_lo, True, freeze_batch_norm, grouped,
                    use_fused_tail, rngs={'dropout': rng},
                    mutable=['batch_stats'])
            sssr, sisr, sssr_t, sisr_t = outs
            new_stats = mutated['batch_stats']
            if spatial:
                sssr = _sp_pin(sssr)
                if sisr is not None:
                    sisr = _sp_pin(sisr)

        seg_full = seg
        if grouped and not dry_run:  # dry-run logits are ungrouped full-res
            from ..ops.conv import group_labels, pixel_unshuffle
            if not use_fused_tail:
                # The fused tail reads labels straight from the full-res map
                # (group_labels_g16_t); only the XLA CE needs them in the
                # grouped-logits layout.
                seg = group_labels(seg, 4)
            if stage > 1 and not hi_unshuffled:
                # SISR stays pre-shuffle; unshuffle the TARGET instead (MSE
                # is permutation-invariant and the no-grad side's transpose
                # fuses into the reduction).  When the post fn already
                # emitted img_hi unshuffled (hi_unshuffled), nothing to do.
                # NB (round 2): un-flattened 6-D/8-D views for the CE labels
                # and MSE target were built and traced — both LOST: the
                # grouped tensors' tiled layouts make the "free" reshapes
                # real copies, and the 8-D CE breaks XLA's iota/broadcast
                # fusion (192 -> 134 img/s).  Keep the flattened forms.
                img_hi = pixel_unshuffle(img_hi, 8)
        if use_fused_tail:
            if labs_t is None:
                from ..ops.conv import group_labels_g16_t
                labs_t = group_labels_g16_t(seg_full)
            ce = _fused_ce(params, sssr, labs_t)
        else:
            ce = cross_entropy_loss(sssr, seg, ignore_label)
        mse = w1 * mse_loss(sisr, img_hi) if stage > 1 else jnp.float32(0)
        fa = w2 * fa_loss(sssr_t, sisr_t) if stage > 2 else jnp.float32(0)
        total = ce + mse + fa
        return total, (new_stats, ce, mse, fa)

    def train_core(state: TrainState, img_lo, img_hi, seg, lr, rng, labs_t=None):
        (total, (new_stats, ce, mse, fa)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   img_lo, img_hi, seg, rng, labs_t)
        if dry_run:
            new_params, new_buf = state.params, state.momentum
        else:
            new_params, new_buf = sgd_update(state.params, grads, state.momentum,
                                             lr, momentum, weight_decay)
        losses = {'CE': ce, 'MSE': mse, 'FA': fa, 'Total': total}
        return TrainState(new_params, new_stats, new_buf), losses

    if post_fn is None:
        return _jit_step(train_core)

    def fused_step(state: TrainState, imgs_u8, segs_u8, lr, rng, labs_t=None):
        rng_post, rng_step = jax.random.split(rng)
        (img_lo, img_hi), (seg_hi, _) = post_fn(imgs_u8, segs_u8, rng_post)
        if use_fused_tail and labs_t is None:
            # Device fallback when the host data plane didn't deliver the
            # g16-major labels (native/dataplane.cpp::dp_labels_g16_t —
            # ~3 ms on host threads, overlapped).  Built straight from the
            # pristine row-major uint8 input (not post's int32 seg_hi,
            # whose layout XLA tunes for other consumers).  NB: XLA prices
            # this permutation at ~7 ms/step next to the pallas consumer; a
            # separate jit dispatch, int32 operands, and a strided-slice
            # formulation all measured SLOWER (194-175 img/s vs 206) —
            # hence the host path.
            from ..ops.conv import group_labels_g16_t
            labs_t = jax.lax.optimization_barrier(
                group_labels_g16_t(segs_u8))
        return train_core(state, img_lo, img_hi, seg_hi, lr, rng_step, labs_t)

    return _jit_step(fused_step)


def make_eval_step(model, stage: int, w1: float, w2: float, num_classes: int,
                   ignore_label: int = 255, dry_run: bool = False,
                   mesh=None, fused_tail: bool = True):
    """Returns fn(params, batch_stats, img_lo, img_hi, seg, sample_mask)
    -> (losses, pred, (area_pred, area_inter, area_target), (correct, valid)).

    The default path runs the FUSED EVAL TAIL (ops/pallas/eval_tail.py): the
    model returns the pre-ConvT cols carry and one Pallas pass computes the
    final ConvT + CE + argmax + all metric reductions with the logits
    resident only in VMEM — the XLA composition spent ~8 ms/step on v5e
    materializing and re-reading the 318 MB grouped logits.  ``fused_tail=
    False``, ``dry_run``, or a spatial mesh fall back to the XLA path (the
    kernel's flattened operands don't shard over an H axis — same rule as
    the train step).

    ``pred`` is the class map in a compact layout — its only consumer is the
    one-visualization-per-pass in the validator, so no path pays a full-res
    interleave for data thrown away every other batch (the in-graph ungroup
    cost ~1.2 ms/step).  The layout is published on the returned callable as
    ``fn.pred_layout`` (shapes alone cannot distinguish them — a batch of 16
    looks like the g16 axis): ``'g16'`` = (16, B, H/4, W/4) i32 g16-major
    (fused path, sample axis SECOND), ``'grouped'`` = (B, H/4, W/4, 16)
    nested-grouped (XLA fallback), ``'full'`` = (B, H, W) (dry_run).
    :func:`ungroup_pred_sample` reconstructs (H, W) given sample + layout.

    ``sample_mask`` ((B,) f32, 1 = real sample) supports padding ragged final
    batches up to the device count: padded rows contribute nothing to any
    loss or metric, so drop_last=False evaluation is exact on a sharded mesh.

    On a multi-device ``mesh`` the fused path shard_maps the kernel over the
    batch-major rows (GSPMD has no partitioning rule for pallas_call) and
    psums the scalar/vector reductions; pass the mesh whenever eval inputs
    are sharded.
    """
    spatial = mesh is not None and mesh.shape.get('spatial', 1) > 1
    use_fused = fused_tail and not dry_run and not spatial

    def _aux_losses(sisr, sssr_t, sisr_t, img_hi, sample_mask, unshuffle):
        """MSE + FA with ragged-batch masking (shared by both paths)."""
        if stage > 1:
            if unshuffle:
                # Grouped SISR stays in pre-shuffle layout; unshuffling the
                # target instead is the same multiset of squared differences.
                from ..ops.conv import pixel_unshuffle
                img_hi = pixel_unshuffle(img_hi, 8)
            per_sample_mse = jnp.mean(
                (sisr.astype(jnp.float32) - img_hi.astype(jnp.float32)) ** 2,
                axis=(1, 2, 3))
            mse = w1 * jnp.sum(per_sample_mse * sample_mask) / jnp.maximum(
                sample_mask.sum(), 1)
        else:
            mse = jnp.float32(0)
        if stage > 2:
            # FA averages per (batch, channel) slice; reweight by sample mask.
            fa = w2 * _fa_masked(sssr_t, sisr_t, sample_mask)
        else:
            fa = jnp.float32(0)
        return mse, fa

    if use_fused:
        from ..ops.pallas.eval_tail import convt_cols_eval
        from ..ops.pallas.fused_tail import pack_tail_params_cols
        from ..ops.conv import group_labels_g16_t
        from ..utils.backend import resolve_backend
        interpret = resolve_backend() != 'tpu'
        multi_dev = mesh is not None and mesh.devices.size > 1

        def eval_core(params, batch_stats, img_lo, img_hi, labs_t, sample_mask):
            b = img_lo.shape[0]
            # Mask padded samples in the label operand itself (columns are
            # batch-major): every pixel becomes ignore, removing them from
            # CE and all metric reductions.
            lt = labs_t.reshape(16, b, -1)
            lt = jnp.where(sample_mask[None, :, None] > 0, lt,
                           jnp.uint8(ignore_label))
            labs_t = lt.reshape(16, -1)

            sssr, sisr, sssr_t, sisr_t = model.apply(
                {'params': params, 'batch_stats': batch_stats}, img_lo,
                False, False, True, True)   # grouped + pre_tail
            tail = params['SSSR_decoder']['upsample16_pred.6']
            wp, bp = pack_tail_params_cols(tail['weight'], tail['bias'])
            bb, h, w, c = sssr.shape
            x = sssr.reshape(bb * h * w, c)

            def per_shard(x, wp, bp, labs_t):
                pred, ce_sum, cnt, hp, hi, ht, cor = convt_cols_eval(
                    x, wp, bp, labs_t, ignore_label, num_classes, interpret)
                # Counts leave the kernel as f32 (exact per shard, < 2^24
                # pixels) but must cross the collective as integers: an f32
                # psum of per-chip 8.4M-pixel counts loses exactness at two
                # chips (16.8M > 2^24), breaking the metric's bit-parity
                # with the reference.  The histogram areas are already i32.
                cnt = cnt.astype(jnp.int32)
                cor = cor.astype(jnp.int32)
                if multi_dev:
                    ce_sum, cnt, cor = (jax.lax.psum(v, 'data')
                                        for v in (ce_sum, cnt, cor))
                    hp, hi, ht = (jax.lax.psum(v, 'data')
                                  for v in (hp, hi, ht))
                return pred, ce_sum, cnt, hp, hi, ht, cor

            if multi_dev:
                # Explicit batch-sharding (rows / label columns / class-map
                # columns are batch-major): GSPMD has no partitioning rule
                # for pallas_call and would otherwise gather the full batch
                # onto every device.
                from jax.sharding import PartitionSpec as P
                per_shard = jax.shard_map(
                    per_shard, mesh=mesh,
                    in_specs=(P('data'), P(), P(), P(None, 'data')),
                    out_specs=(P(None, 'data'), P(), P(), P(), P(), P(), P()),
                    check_vma=False)
            pred, ce_sum, cnt, hp, hi, ht, cor = per_shard(x, wp, bp, labs_t)

            cnt_f = cnt.astype(jnp.float32)
            ce = jnp.where(cnt > 0, ce_sum / jnp.maximum(cnt_f, 1.0), 0.0)
            mse, fa = _aux_losses(sisr, sssr_t, sisr_t, img_hi, sample_mask,
                                  unshuffle=True)
            losses = {'CE': ce, 'MSE': mse, 'FA': fa, 'Total': ce + mse + fa}
            return losses, pred.reshape(16, bb, h, w), (hp, hi, ht), (cor, cnt)

        core = jax.jit(eval_core)
        # The g16 label build runs in its OWN dispatch: standalone it is a
        # memory-speed shuffle, but embedded next to the pallas consumer
        # XLA's layout assignment staged it through ~7 ms/step of relayouts
        # (ops/conv.py::group_labels_g16_t, measured on the train step).
        labs_fn = jax.jit(group_labels_g16_t)

        def eval_fn(params, batch_stats, img_lo, img_hi, seg, sample_mask):
            return core(params, batch_stats, img_lo, img_hi, labs_fn(seg),
                        sample_mask)

        eval_fn.pred_layout = 'g16'

        # Packed fast path: a PackedTrainState crosses the boundary as ONE
        # buffer + big leaves instead of ~900 small parameter buffers (see
        # train/packing.py — the per-buffer materialization latency costs
        # ~2 ms on a ~15 ms eval step).  The g16 label build keeps its own
        # dispatch, same as the unpacked path.
        def _packed_eval(pstate, img_lo, img_hi, labs_t, sample_mask):
            st = pstate.packer.unpack(pstate.packed, pstate.bigs)
            return eval_core(st.params, st.batch_stats, img_lo, img_hi,
                             labs_t, sample_mask)

        packed_jit = jax.jit(_packed_eval)

        def from_state(state, img_lo, img_hi, seg, sample_mask):
            from .packing import PackedTrainState
            if isinstance(state, PackedTrainState):
                return packed_jit(state, img_lo, img_hi, labs_fn(seg),
                                  sample_mask)
            return eval_fn(state.params, state.batch_stats, img_lo, img_hi,
                           seg, sample_mask)

        def aot_compile(state, img_lo, img_hi, seg, sample_mask):
            """AOT-compile the exact programs ``from_state`` is about to
            dispatch on these operands, without running the metric pass —
            multi-process first-dispatch alignment (the engine wraps this in
            :func:`parallel.align_first_dispatch`; communicator init at the
            first execution has a hard ~30 s window while compile times skew
            across ranks).  ``labs_fn`` does execute here: it has no
            cross-process collective and its sub-second compile cannot skew
            past the window."""
            from .packing import PackedTrainState
            labs = labs_fn(seg)
            if isinstance(state, PackedTrainState):
                packed_jit.lower(state, img_lo, img_hi, labs,
                                 sample_mask).compile()
            else:
                core.lower(state.params, state.batch_stats, img_lo, img_hi,
                           labs, sample_mask).compile()

        eval_fn.from_state = from_state
        eval_fn.aot_compile = aot_compile
        return eval_fn

    def eval_step(params, batch_stats, img_lo, img_hi, seg, sample_mask):
        # Mask padded samples out of the label tensor: every pixel becomes
        # ignore, removing them from CE and the metric histograms.
        seg = jnp.where(sample_mask[:, None, None] > 0, seg, ignore_label)

        if dry_run:
            b, h, w = seg.shape
            key = jax.random.PRNGKey(0)
            sssr = jax.random.normal(key, (b, h, w, num_classes))
            sisr = jax.random.normal(key, img_hi.shape) if stage > 1 else None
            # Synthesized transformer outputs at their real shape (output/8),
            # like the reference's dry-run intent (train_or_resume.py:422-423;
            # its (B,1,2,2) literal crashes FALoss's AvgPool2d(8) — not
            # replicated), so stage-3 FA still exercises.
            sssr_t = jax.random.normal(key, (b, h // 8, w // 8, 1))
            sisr_t = jax.random.normal(jax.random.fold_in(key, 1), (b, h // 8, w // 8, 1))
            ce = cross_entropy_loss(sssr, seg, ignore_label)
            pred = argmax_lastdim(sssr)
        else:
            # GROUPED layout end to end: CE, argmax and the metric
            # histograms are permutation-invariant over the pixel set, so
            # they run on the (B, H/4, W/4, 16, C) logits directly and
            # NOTHING is interleaved back to full resolution in-graph —
            # the class map is returned grouped (see docstring; the earlier
            # in-graph ungroup cost ~1.2 ms/step, and before that the
            # ungrouped-logits path cost ~4 ms/step per pass).
            from ..ops.conv import group_labels
            sssr, sisr, sssr_t, sisr_t = model.apply(
                {'params': params, 'batch_stats': batch_stats}, img_lo,
                False, False, True)
            seg = group_labels(seg, 4)
            ce = cross_entropy_loss(sssr, seg, ignore_label)
            pred = argmax_lastdim(sssr)

        mse, fa = _aux_losses(sisr, sssr_t, sisr_t, img_hi, sample_mask,
                              unshuffle=not dry_run)
        total = ce + mse + fa
        hists = batch_histograms(pred, seg, num_classes, ignore_label)
        acc = batch_accuracy_counts(pred, seg, ignore_label)
        losses = {'CE': ce, 'MSE': mse, 'FA': fa, 'Total': total}
        return losses, pred, hists, acc

    jitted = jax.jit(eval_step)

    def eval_fallback(params, batch_stats, img_lo, img_hi, seg, sample_mask):
        return jitted(params, batch_stats, img_lo, img_hi, seg, sample_mask)

    def _packed_eval(pstate, img_lo, img_hi, seg, sample_mask):
        st = pstate.packer.unpack(pstate.packed, pstate.bigs)
        return eval_step(st.params, st.batch_stats, img_lo, img_hi, seg,
                         sample_mask)

    packed_jit = jax.jit(_packed_eval)

    def from_state(state, img_lo, img_hi, seg, sample_mask):
        from .packing import PackedTrainState
        if isinstance(state, PackedTrainState):
            return packed_jit(state, img_lo, img_hi, seg, sample_mask)
        return eval_fallback(state.params, state.batch_stats, img_lo, img_hi,
                             seg, sample_mask)

    def aot_compile(state, img_lo, img_hi, seg, sample_mask):
        """See the fused path's twin: compile-only alignment hook for the
        multi-process first dispatch."""
        from .packing import PackedTrainState
        if isinstance(state, PackedTrainState):
            packed_jit.lower(state, img_lo, img_hi, seg, sample_mask).compile()
        else:
            jitted.lower(state.params, state.batch_stats, img_lo, img_hi, seg,
                         sample_mask).compile()

    eval_fallback.pred_layout = 'full' if dry_run else 'grouped'
    eval_fallback.from_state = from_state
    eval_fallback.aot_compile = aot_compile
    return eval_fallback


def ungroup_pred_sample(pred_sample: np.ndarray, layout: str) -> np.ndarray:
    """Host-side inverse of the eval step's compact class map for ONE sample
    -> (H, W) full resolution; numpy so the per-pass visualization never
    pays a device transpose or a compile.

    ``layout`` is the producing eval step's ``fn.pred_layout`` — it must be
    passed explicitly because shapes cannot distinguish the layouts (a
    grouped sample with batch-or-height 16 is ambiguous):

    * ``'g16'``: (16, H/4, W/4) g16-major (fused eval tail; row
      g = ((i*2+j)*2+k)*2+l holds full-res pixel (4h+2i+k, 4w+2j+l), like
      the label operand of ops/conv.py::group_labels_g16_t),
    * ``'grouped'``: (H/4, W/4, 16) nested-grouped (XLA fallback;
      ops/conv.py::ungroup_2x2),
    * ``'full'``: (H, W) full-res (dry_run), passed through unchanged.
    """
    pred_sample = np.asarray(pred_sample)
    if layout == 'full':
        assert pred_sample.ndim == 2, pred_sample.shape
        return pred_sample
    assert pred_sample.ndim == 3, pred_sample.shape
    if layout == 'g16':
        assert pred_sample.shape[0] == 16, pred_sample.shape
        h, w = pred_sample.shape[1], pred_sample.shape[2]
        x = pred_sample.reshape(2, 2, 2, 2, h, w)   # (i, j, k, l, h, w)
        x = x.transpose(4, 0, 2, 5, 1, 3)           # (h, i, k, w, j, l)
    elif layout == 'grouped':
        assert pred_sample.shape[-1] == 16, pred_sample.shape
        h, w = pred_sample.shape[0], pred_sample.shape[1]
        x = pred_sample.reshape(h, w, 2, 2, 2, 2)   # (h, w, i, j, k, l)
        x = x.transpose(0, 2, 4, 1, 3, 5)           # (h, i, k, w, j, l)
    else:
        raise ValueError("unknown eval pred layout {!r}".format(layout))
    return np.ascontiguousarray(x.reshape(4 * h, 4 * w))


def _fa_masked(sssr_t, sisr_t, sample_mask):
    """FA loss restricted to unmasked samples (per-sample vmap + weighting)."""
    from ..losses import fa_loss as _fa

    per_sample = jax.vmap(lambda a, b: _fa(a[None], b[None]))(sssr_t, sisr_t)
    return jnp.sum(per_sample * sample_mask) / jnp.maximum(sample_mask.sum(), 1)
