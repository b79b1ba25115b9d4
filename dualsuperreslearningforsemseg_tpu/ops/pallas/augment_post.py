"""Pallas TPU kernel: the device photometric tail in one pass.

The host-warp input path leaves the device three elementwise jobs per step
(data/augment.py::make_device_post_fn): the 3-tap gaussian blur (per-sample
taps; identity taps when the draw says no blur), the folded color affine
(grayscale-or-identity mix x 1/255 / std, offset -mean/std), and the
narrowing cast to the compute dtype.  Left to XLA these cost ~2.8 ms/step
at the reference shapes (16x512x1024x3): the chain materializes THREE
full-resolution f32 intermediates (taps pass, affine pass, convert pass)
plus layout copies between them, because the reflect-pad slices, the
per-sample (3,3) dot and the convert land in different fusions
(trace: fusion.43 0.40 ms + fusion.30 0.30 ms + fusion.46 0.27 ms +
copy.573 0.54 ms + assorted).

This kernel streams row strips of the PLANAR uint8 image once and writes
the normalized compute-dtype result once: read ~25 MB u8, write ~50 MB
bf16, everything else in VMEM/registers — the roofline for this job is
~0.1 ms.  Per-sample taps and color matrices ride in SMEM.

Layout contract: images are channel-planar (B, 3, H, W) — W rides the
128-wide lane axis at full efficiency; the interleaved NHWC orientation
would put C=3 on lanes (2% occupancy).  The C++ data plane emits this
orientation directly (dp_warp_pair_batch_planar); an XLA transpose of the
uint8 input is the fallback.

Reflect padding (torchvision GaussianBlur semantics): row/col -1 maps to
row/col 1, row/col H maps to H-2.  Horizontal neighbors come from lane
rolls with an edge fix; vertical neighbors from single-row halo operands
(block index maps clamped at the image edge, in-kernel reflect fix).

No backward: the augment tail is upstream of every parameter.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_TH = 64    # rows per strip: (3, 64, 1024) f32 working set = ~786 KB


def _strip_rows(h: int) -> int:
    for th in range(min(_MAX_TH, h), 0, -8):
        if h % th == 0:
            return th
    return h


def _kernel(prev_ref, cur_ref, next_ref, taps_ref, cmat_ref, coff_ref,
            out_ref, *rest, n_strips, out_dtype, unshuffle):
    i = pl.program_id(1)
    # Mosaic has no unsigned->float cast; hop through int32.
    cur = cur_ref[0].astype(jnp.int32).astype(jnp.float32)          # (3, TH, W)
    th = cur.shape[1]
    # Halo operands are 8-row blocks (the minimum legal sublane tile); the
    # needed single row is the block's last/first row.
    prev_row = prev_ref[0, :, 7:8, :].astype(jnp.int32).astype(jnp.float32)   # (3, 1, W)
    next_row = next_ref[0, :, 0:1, :].astype(jnp.int32).astype(jnp.float32)
    # Image-edge reflect: the clamped halo operand duplicated the edge row;
    # replace it with the true reflect row from inside the strip.
    prev_row = jnp.where(i == 0, cur[:, 1:2, :], prev_row)
    next_row = jnp.where(i == n_strips - 1, cur[:, th - 2:th - 1, :],
                         next_row)

    t0 = taps_ref[0, 0, 0]
    t1 = taps_ref[0, 0, 1]
    t2 = taps_ref[0, 0, 2]
    up = jnp.concatenate([prev_row, cur[:, :-1, :]], axis=1)
    down = jnp.concatenate([cur[:, 1:, :], next_row], axis=1)
    v = t0 * up + t1 * cur + t2 * down            # vertical taps

    w = v.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
    fwd = pltpu.roll(v, w - 1, 2)                 # lane l -> v[l+1]
    bwd = pltpu.roll(v, 1, 2)                     # lane l -> v[l-1]
    left = jnp.where(lane == 0, fwd, bwd)         # col -1 == col 1 reflect
    right = jnp.where(lane == w - 1, bwd, fwd)    # col W == col W-2 reflect
    hbl = t0 * left + t1 * v + t2 * right         # horizontal taps

    # Folded color affine: out_d = sum_c hbl_c * M[c, d] + off_d.
    out = jnp.concatenate(
        [cmat_ref[0, 0, d] * hbl[0:1] + cmat_ref[0, 1, d] * hbl[1:2]
         + cmat_ref[0, 2, d] * hbl[2:3] + coff_ref[0, 0, d]
         for d in range(3)], axis=0)
    out_ref[0] = out.astype(out_dtype)
    if unshuffle:
        # Second emission: the pixel-UNSHUFFLED MSE-target layout written
        # from registers.  MEASURED REJECTION on v5e: Mosaic cannot lower
        # the rank-5 lane-splitting shape cast ("infer-vector-layout:
        # unsupported shape cast"), so the permutation stays an XLA
        # transpose outside the kernel (~1.2 ms/step at the reference
        # shapes).  Interpret mode still supports it; kept for the day
        # Mosaic learns the relayout.
        r = unshuffle
        un_ref, = rest
        y = out.reshape(3, th // r, r, w // r, r)       # (c, h', i, w', j)
        y = y.transpose(1, 3, 0, 2, 4)                  # (h', w', c, i, j)
        un_ref[0] = y.reshape(th // r, w // r, 3 * r * r).astype(out_dtype)


def photometric_planar(img_u8, taps, cmat, coff, out_dtype=jnp.bfloat16,
                       interpret=False, unshuffle=0):
    """(B, 3, H, W) uint8 -> (B, 3, H, W) ``out_dtype`` normalized images.

    Args:
      img_u8: planar uint8 batch; H % 8 == 0, W % 128 == 0.
      taps: (B, 3) f32 per-sample blur taps (sum 1; (0, 1, 0) = no blur).
      cmat: (B, 3, 3) f32 per-sample color matrix (grayscale mix or
        identity, folded with 1/255 and 1/std — see
        data/augment.py::make_device_post_fn).
      coff: (B, 3) f32 per-sample color offset (-mean/std).
      unshuffle: nonzero r -> ALSO return the pixel-unshuffled
        (B, H/r, W/r, 3*r*r) image (torch PixelUnshuffle channel order),
        written straight from the kernel's registers.
    """
    b, c, h, w = img_u8.shape
    assert c == 3 and h % 8 == 0 and w % 128 == 0, img_u8.shape
    th = _strip_rows(h)
    n_strips = h // th
    if unshuffle:
        assert th % unshuffle == 0 and w % unshuffle == 0, (th, w, unshuffle)
    kernel = functools.partial(_kernel, n_strips=n_strips,
                               out_dtype=out_dtype, unshuffle=unshuffle)
    out_specs = [pl.BlockSpec((1, 3, th, w), lambda bi, i: (bi, 0, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, 3, h, w), out_dtype)]
    if unshuffle:
        r = unshuffle
        out_specs.append(pl.BlockSpec((1, th // r, w // r, 3 * r * r),
                                      lambda bi, i: (bi, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h // r, w // r, 3 * r * r),
                                              out_dtype))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_strips),
        in_specs=[
            # 8-row halo blocks: the row above the strip is row 7 of block
            # i*th/8 - 1; the row below is row 0 of block (i+1)*th/8
            # (clamped at the image edge; the kernel's reflect fix replaces
            # the clamped duplicates).
            pl.BlockSpec((1, 3, 8, w),
                         lambda bi, i: (bi, 0,
                                        jnp.maximum(i * (th // 8) - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, w),
                         lambda bi, i: (bi, 0,
                                        jnp.minimum((i + 1) * (th // 8),
                                                    h // 8 - 1), 0),
                         memory_space=pltpu.VMEM),
            # Per-sample scalars: the last two block dims must equal the
            # full array dims, hence the (B, 1, 3) shapes.
            pl.BlockSpec((1, 1, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=30 * img_u8.size,
            bytes_accessed=img_u8.size + (2 if unshuffle else 1)
            * img_u8.size * jnp.dtype(out_dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(img_u8, img_u8, img_u8, taps.reshape(b, 1, 3), cmat,
      coff.reshape(b, 1, 3))
    return (out[0], out[1]) if unshuffle else out[0]
