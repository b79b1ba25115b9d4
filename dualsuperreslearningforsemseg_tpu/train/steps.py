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

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..losses import cross_entropy_loss, mse_loss, fa_loss
from ..metrics.device import batch_histograms, batch_accuracy_counts
from .optim import sgd_update


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    momentum: Any


def make_train_step(model, stage: int, w1: float, w2: float, momentum: float,
                    weight_decay: float, ignore_label: int = 255,
                    freeze_batch_norm: bool = False, mesh=None, dry_run: bool = False,
                    num_classes: int = 19, post_fn=None, grouped: bool = True):
    """Returns jitted fn(state, img_lo, img_hi, seg, lr, rng) ->
    (state, losses-dict of f32 scalars).

    With ``post_fn`` (the device photometric tail from
    data.augment.make_device_post_fn, passed un-jitted), the returned step
    instead takes raw warped uint8 batches — fn(state, imgs_u8, segs_u8, lr,
    rng) — fusing augmentation tail + forward + backward + update into ONE
    XLA program (one dispatch per step; the normalize fuses into the first
    convolution's prologue)."""

    def loss_fn(params, batch_stats, img_lo, img_hi, seg, rng):
        variables = {'params': params, 'batch_stats': batch_stats}
        if dry_run:
            # Exercise the full boilerplate without the network
            # (reference --dry-run, train_or_resume.py:420-424).
            b, h, w = seg.shape
            sssr = jax.random.normal(rng, (b, h, w, num_classes))
            sisr = jax.random.normal(rng, img_hi.shape) if stage > 1 else None
            sssr_t = sisr_t = None
            new_stats = batch_stats
        else:
            # train=True with BN frozen still runs in train mode for dropout;
            # freeze is handled by the model's use_running_average plumbing.
            # grouped=True keeps the SSSR tail in space-to-depth layout (see
            # ops/conv.py): the labels are grouped to match below, and the
            # loss value is mathematically identical.
            outs, mutated = model.apply(
                variables, img_lo, True, freeze_batch_norm, grouped and not dry_run,
                rngs={'dropout': rng}, mutable=['batch_stats'])
            sssr, sisr, sssr_t, sisr_t = outs
            new_stats = mutated['batch_stats']

        if grouped and not dry_run:
            from ..ops.conv import group_labels, pixel_unshuffle
            seg = group_labels(seg, 4)
            if stage > 1:
                # SISR stays pre-shuffle; unshuffle the TARGET instead (MSE
                # is permutation-invariant and the no-grad side's transpose
                # fuses into the reduction).
                img_hi = pixel_unshuffle(img_hi, 8)
        # NB: two Pallas CE kernels were built and measured against this XLA
        # CE (round 2): a lane-sliced variant (125 img/s) and an MXU
        # segment-matmul variant (171 img/s) — both lost to XLA's fused CE
        # (195 img/s) because Pallas forces row-major operand layouts, which
        # re-introduces the very relayout copies the kernel was meant to
        # remove.  The ~12 ms/step of grouped-logits transpose copies remain
        # an XLA layout-assignment artifact; revisit only with a kernel that
        # also OWNS the producing matmul (fused ConvT+CE).
        ce = cross_entropy_loss(sssr, seg, ignore_label)
        mse = w1 * mse_loss(sisr, img_hi) if stage > 1 else jnp.float32(0)
        fa = w2 * fa_loss(sssr_t, sisr_t) if stage > 2 else jnp.float32(0)
        total = ce + mse + fa
        return total, (new_stats, ce, mse, fa)

    def train_core(state: TrainState, img_lo, img_hi, seg, lr, rng):
        (total, (new_stats, ce, mse, fa)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   img_lo, img_hi, seg, rng)
        if dry_run:
            new_params, new_buf = state.params, state.momentum
        else:
            new_params, new_buf = sgd_update(state.params, grads, state.momentum,
                                             lr, momentum, weight_decay)
        losses = {'CE': ce, 'MSE': mse, 'FA': fa, 'Total': total}
        return TrainState(new_params, new_stats, new_buf), losses

    if post_fn is None:
        return jax.jit(train_core, donate_argnums=(0,))

    def fused_step(state: TrainState, imgs_u8, segs_u8, lr, rng):
        rng_post, rng_step = jax.random.split(rng)
        (img_lo, img_hi), (seg_hi, _) = post_fn(imgs_u8, segs_u8, rng_post)
        return train_core(state, img_lo, img_hi, seg_hi, lr, rng_step)

    return jax.jit(fused_step, donate_argnums=(0,))


def make_eval_step(model, stage: int, w1: float, w2: float, num_classes: int,
                   ignore_label: int = 255, dry_run: bool = False):
    """Returns jitted fn(params, batch_stats, img_lo, img_hi, seg, sample_mask)
    -> (losses, pred (B,H,W) i32, (area_pred, area_inter, area_target),
    (correct, valid)).

    ``sample_mask`` ((B,) f32, 1 = real sample) supports padding ragged final
    batches up to the device count: padded rows contribute nothing to any
    loss or metric, so drop_last=False evaluation is exact on a sharded mesh.
    """

    def eval_step(params, batch_stats, img_lo, img_hi, seg, sample_mask):
        if dry_run:
            b, h, w = seg.shape
            key = jax.random.PRNGKey(0)
            sssr = jax.random.normal(key, (b, h, w, num_classes))
            sisr = jax.random.normal(key, img_hi.shape) if stage > 1 else None
            sssr_t = sisr_t = None
        else:
            sssr, sisr, sssr_t, sisr_t = model.apply(
                {'params': params, 'batch_stats': batch_stats}, img_lo, False)

        # Mask padded samples out of the label tensor: every pixel becomes
        # ignore, removing them from CE and the metric histograms.
        seg = jnp.where(sample_mask[:, None, None] > 0, seg, ignore_label)
        ce = cross_entropy_loss(sssr, seg, ignore_label)
        if stage > 1:
            per_sample_mse = jnp.mean(
                (sisr.astype(jnp.float32) - img_hi.astype(jnp.float32)) ** 2,
                axis=(1, 2, 3))
            mse = w1 * jnp.sum(per_sample_mse * sample_mask) / jnp.maximum(sample_mask.sum(), 1)
        else:
            mse = jnp.float32(0)
        if stage > 2:
            # FA averages per (batch, channel) slice; reweight by sample mask.
            fa = w2 * _fa_masked(sssr_t, sisr_t, sample_mask)
        else:
            fa = jnp.float32(0)
        total = ce + mse + fa
        pred = jnp.argmax(sssr, axis=-1).astype(jnp.int32)
        hists = batch_histograms(pred, seg, num_classes, ignore_label)
        acc = batch_accuracy_counts(pred, seg, ignore_label)
        losses = {'CE': ce, 'MSE': mse, 'FA': fa, 'Total': total}
        return losses, pred, hists, acc

    return jax.jit(eval_step)


def _fa_masked(sssr_t, sisr_t, sample_mask):
    """FA loss restricted to unmasked samples (per-sample vmap + weighting)."""
    from ..losses import fa_loss as _fa

    per_sample = jax.vmap(lambda a, b: _fa(a[None], b[None]))(sssr_t, sisr_t)
    return jnp.sum(per_sample * sample_mask) / jnp.maximum(sample_mask.sum(), 1)
