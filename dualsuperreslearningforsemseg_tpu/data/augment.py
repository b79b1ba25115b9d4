"""Device-side fused augmentation.

The reference augments on host CPU with PIL inside DataLoader workers
(/root/reference/command_handlers/train_or_resume.py:128-137): rotate ±15°,
random zoom-crop (scale 1..3.5), label mapping, h-flip, gaussian blur,
grayscale, normalize, then a 3-way resize (JointScaledImage) — five separate
resampling passes per sample on the host.

TPU-native redesign: the host only decodes PNGs; one jitted batch kernel does
the rest on device.  Rotation, zoom-crop, h-flip and the resize to the model
sizes compose into a **single affine warp** (one bilinear resample for the
image, one nearest resample for labels — instead of five), the 34->19 label
translation is a vectorized 256-entry LUT gather (vs the reference's python
loop, JointImageAndLabelTensor.py:13-14), and blur/grayscale/normalize fuse
into the same XLA program.  Randomness comes from ``jax.random`` keys, so the
pipeline is reproducible under the reference's fixed-seed contract.

Deliberate deviations from reference behavior (documented per SURVEY.md §7):
* the reference limits the zoom-crop offset to half the valid range
  (JointRandomCrop.py:29-30 — a bug); we sample the full range;
* sequential resampling (rotate at full res, crop-resize, final resize) is
  collapsed into one warp — fewer interpolation artifacts, not bit-identical
  augmentation (augmentation is random; only the *eval* path needs exact
  numerics, and ``make_eval_transform_fn`` reproduces the reference's val
  pipeline exactly: LUT -> normalize -> align-corners/nearest resizes).
"""

import dataclasses
import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resize import (resize_bilinear_align_corners, resize_bilinear_matmul,
                          resize_bilinear_matmul_hw, resize_nearest)

# ITU-R 601 luma mix — torchvision Grayscale's coefficients
# (/root/reference/models/transforms/JointRandomGrayscale.py via PIL 'L').
# ONE definition: the jitter's gray, the fallback grayscale, and the folded
# color affine (gray_mix) must stay in lockstep.
_LUMA = (0.299, 0.587, 0.114)


def _luma_of(img):
    """(..., 3) -> (..., 1) ITU-R 601 luma."""
    return (_LUMA[0] * img[..., 0] + _LUMA[1] * img[..., 1]
            + _LUMA[2] * img[..., 2])[..., None]


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    input_hw: Tuple[int, int] = (256, 512)     # model input (img_lo)
    output_hw: Tuple[int, int] = (512, 1024)   # model output (img_hi / seg)
    degrees: float = 15.0
    min_scale: float = 1.0
    max_scale: float = 3.5
    hflip_p: float = 0.5
    blur_p: float = 0.5
    blur_sigma: Tuple[float, float] = (0.1, 2.0)   # torchvision GaussianBlur default
    grayscale_p: float = 0.1
    # Color jitter (parity with the reference's JointColorJitter component,
    # /root/reference/models/transforms/JointColorJitter.py:58-101 —
    # commented out of its training pipeline, train_or_resume.py:131, so
    # disabled by default here too).  0 disables each sub-op.
    color_jitter: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    mean: Tuple[float, float, float] = (0.28690, 0.32513, 0.28389)
    std: Tuple[float, float, float] = (0.17614, 0.18099, 0.17772)
    ignore_label: int = 255


def _sample_affine(key, src_hw, out_hw, cfg: AugmentConfig):
    """Per-sample 2x3 matrix mapping OUTPUT pixel coords -> SOURCE coords,
    composing h-flip -> out->src scaling -> zoom-crop -> inverse rotation.
    Center-based pixel convention throughout."""
    h0, w0 = src_hw
    oh, ow = out_hw
    k_ang, k_scale, k_cx, k_cy, k_flip = jax.random.split(key, 5)

    angle = jax.random.uniform(k_ang, (), minval=-cfg.degrees, maxval=cfg.degrees) * (np.pi / 180.0)
    scale = jax.random.uniform(k_scale, (), minval=cfg.min_scale, maxval=cfg.max_scale)
    crop_w = w0 / scale
    crop_h = h0 / scale
    crop_x = jax.random.uniform(k_cx, (), minval=0.0, maxval=1.0) * (w0 - crop_w)
    crop_y = jax.random.uniform(k_cy, (), minval=0.0, maxval=1.0) * (h0 - crop_h)
    flip = jax.random.bernoulli(k_flip, cfg.hflip_p)

    # out pixel -> crop-frame source coords (maps [0,ow) onto [crop_x, crop_x+crop_w))
    sx_scale = crop_w / ow
    sy_scale = crop_h / oh
    # x_c = crop_x + (x+0.5)*sx_scale - 0.5 ; optional flip first: x -> ow-1-x
    a0 = jnp.where(flip, -sx_scale, sx_scale)
    b0 = jnp.where(flip, crop_x + (ow - 0.5) * sx_scale - 0.5, crop_x + 0.5 * sx_scale - 0.5)
    a1 = sy_scale
    b1 = crop_y + 0.5 * sy_scale - 0.5

    # inverse rotation about the full-image center
    cx, cy = (w0 - 1) / 2.0, (h0 - 1) / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # src = R @ (p - c) + c where p = (a*out + b)
    # Row for src_x: cos*(x_c - cx) - sin*(y_c - cy) + cx
    m00 = cos * a0
    m01 = -sin * a1
    m02 = cos * (b0 - cx) - sin * (b1 - cy) + cx
    m10 = sin * a0
    m11 = cos * a1
    m12 = sin * (b0 - cx) + cos * (b1 - cy) + cy
    return jnp.stack([jnp.stack([m00, m01, m02]), jnp.stack([m10, m11, m12])])


def _source_coords(matrix, out_hw):
    oh, ow = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    sx = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    sy = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    return sx, sy


def _flat_take(img_flat, y_idx, x_idx, w0):
    """Gather pixels by (y, x) index maps as a SINGLE-axis take of the
    row-flattened image.  A 2-D advanced-indexing gather lowers to scalarized
    code on TPU (minutes of compile, slow execution); a flat 1-D take lowers
    to the same efficient dynamic-gather as the resize ops."""
    flat_idx = (y_idx * w0 + x_idx).reshape(-1)
    return jnp.take(img_flat, flat_idx, axis=0)


def _warp_bilinear(img, matrix, out_hw, fill):
    """Affine-resample one (H, W, C) image to out_hw with bilinear filtering;
    out-of-bounds pixels get ``fill``."""
    h0, w0, c = img.shape
    oh, ow = out_hw
    sx, sy = _source_coords(matrix, out_hw)
    valid = (sx >= 0) & (sx <= w0 - 1) & (sy >= 0) & (sy <= h0 - 1)

    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w0 - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h0 - 1)
    x1 = jnp.minimum(x0 + 1, w0 - 1)
    y1 = jnp.minimum(y0 + 1, h0 - 1)
    fx = (sx - x0).reshape(-1, 1)
    fy = (sy - y0).reshape(-1, 1)

    img_flat = img.reshape(h0 * w0, c)
    v00 = _flat_take(img_flat, y0, x0, w0)
    v01 = _flat_take(img_flat, y0, x1, w0)
    v10 = _flat_take(img_flat, y1, x0, w0)
    v11 = _flat_take(img_flat, y1, x1, w0)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    out = out.reshape(oh, ow, c)
    return jnp.where(valid[..., None], out, fill)


def _warp_nearest(seg, matrix, out_hw, fill):
    h0, w0 = seg.shape[0], seg.shape[1]
    oh, ow = out_hw
    sx, sy = _source_coords(matrix, out_hw)
    xr = jnp.round(sx).astype(jnp.int32)
    yr = jnp.round(sy).astype(jnp.int32)
    valid = (xr >= 0) & (xr < w0) & (yr >= 0) & (yr < h0)
    flat = _flat_take(seg.reshape(-1, 1), jnp.clip(yr, 0, h0 - 1),
                      jnp.clip(xr, 0, w0 - 1), w0)
    out = flat.reshape(oh, ow)
    return jnp.where(valid, out, jnp.asarray(fill, seg.dtype))


def _gaussian_blur3(img, sigma):
    """Separable 3-tap gaussian (torchvision GaussianBlur(kernel_size=3)):
    reflect padding, kernel exp(-x²/2σ²) normalized."""
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k = k / k.sum()
    pad_h = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode='reflect')
    img = pad_h[:-2] * k[0] + pad_h[1:-1] * k[1] + pad_h[2:] * k[2]
    pad_w = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode='reflect')
    return pad_w[:, :-2] * k[0] + pad_w[:, 1:-1] * k[1] + pad_w[:, 2:] * k[2]


def _color_jitter(img, key, cfg: AugmentConfig):
    """brightness/contrast/saturation/hue with random strengths, applied in a
    random order like torchvision ColorJitter; hue via the reference's RGB
    rotation-matrix shortcut (JointColorJitter.py:90-100)."""
    b, c, s, h = cfg.color_jitter
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), minval=max(0.0, 1 - b), maxval=1 + b)
    fc = jax.random.uniform(k_c, (), minval=max(0.0, 1 - c), maxval=1 + c)
    fs = jax.random.uniform(k_s, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fh = jax.random.uniform(k_h, (), minval=-h, maxval=h)

    gray_of = _luma_of

    def op_brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0) if b else x

    def op_contrast(x):
        if not c:
            return x
        mean_gray = gray_of(x).mean()
        return jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 1.0)

    def op_saturation(x):
        if not s:
            return x
        return jnp.clip((x - gray_of(x)) * fs + gray_of(x), 0.0, 1.0)

    def op_hue(x):
        if not h:
            return x
        angle = fh * 2.0 * np.pi
        cosA, sinA = jnp.cos(angle), jnp.sin(angle)
        third, sq3 = 1.0 / 3.0, float(np.sqrt(1.0 / 3.0))
        m = jnp.stack([
            jnp.stack([cosA + (1 - cosA) * third, third * (1 - cosA) - sq3 * sinA, third * (1 - cosA) + sq3 * sinA]),
            jnp.stack([third * (1 - cosA) + sq3 * sinA, cosA + third * (1 - cosA), third * (1 - cosA) - sq3 * sinA]),
            jnp.stack([third * (1 - cosA) - sq3 * sinA, third * (1 - cosA) + sq3 * sinA, cosA + third * (1 - cosA)]),
        ])
        return jnp.clip(jnp.einsum('hwc,cd->hwd', x, m), 0.0, 1.0)

    ops = [op_brightness, op_contrast, op_saturation, op_hue]
    order = jax.random.permutation(k_perm, 4)
    for slot in range(4):
        img = jax.lax.switch(order[slot], ops, img)
    return img


def make_train_augment_fn(cfg: AugmentConfig, label_lut: np.ndarray):
    """Returns jitted fn: (images_u8 (B,H0,W0,3), segs_u8 (B,H0,W0), key) ->
    ((img_lo, img_hi), (seg_hi, seg_lo)) matching the reference's
    JointScaledImage output structure (JointScaledImage.py:27-32); seg targets
    are int32 with 255 = ignore."""
    lut = jnp.asarray(label_lut)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)

    def one_sample(img_u8, seg_u8, key):
        src_hw = img_u8.shape[:2]
        k_aff, k_blur_p, k_blur_s, k_gray, k_jit = jax.random.split(key, 5)
        matrix = _sample_affine(k_aff, src_hw, cfg.output_hw, cfg)

        img = img_u8.astype(jnp.float32) / 255.0
        img_hi = _warp_bilinear(img, matrix, cfg.output_hw, fill=0.0)
        seg_raw = _warp_nearest(seg_u8, matrix, cfg.output_hw, fill=255)
        seg_hi = jnp.take(lut, seg_raw.astype(jnp.int32), axis=0).astype(jnp.int32)

        if any(cfg.color_jitter):
            img_hi = _color_jitter(img_hi, k_jit, cfg)

        do_blur = jax.random.bernoulli(k_blur_p, cfg.blur_p)
        sigma = jax.random.uniform(k_blur_s, (), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
        img_hi = jnp.where(do_blur, _gaussian_blur3(img_hi, sigma), img_hi)

        do_gray = jax.random.bernoulli(k_gray, cfg.grayscale_p)
        gray = _luma_of(img_hi)
        img_hi = jnp.where(do_gray, jnp.broadcast_to(gray, img_hi.shape), img_hi)

        img_hi = (img_hi - mean) / std
        return img_hi, seg_hi

    @jax.jit
    def augment(images_u8, segs_u8, key):
        keys = jax.random.split(key, images_u8.shape[0])
        img_hi, seg_hi = jax.vmap(one_sample)(images_u8, segs_u8, keys)
        img_lo = resize_bilinear_align_corners(img_hi, cfg.input_hw)
        seg_lo = resize_nearest(seg_hi, cfg.input_hw, spatial_axes=(-2, -1))
        return (img_lo, img_hi), (seg_hi, seg_lo)

    return augment


def sample_affine_matrices_np(rng: np.random.Generator, n: int, src_hw, out_hw,
                              cfg: AugmentConfig) -> np.ndarray:
    """Numpy mirror of :func:`_sample_affine` for the host-warp path: (n,2,3)
    matrices composing h-flip, out->src scaling, zoom-crop and rotation."""
    h0, w0 = src_hw
    oh, ow = out_hw
    angle = rng.uniform(-cfg.degrees, cfg.degrees, n) * (np.pi / 180.0)
    scale = rng.uniform(cfg.min_scale, cfg.max_scale, n)
    crop_w = w0 / scale
    crop_h = h0 / scale
    crop_x = rng.uniform(0.0, 1.0, n) * (w0 - crop_w)
    crop_y = rng.uniform(0.0, 1.0, n) * (h0 - crop_h)
    flip = rng.random(n) < cfg.hflip_p

    sx_scale = crop_w / ow
    sy_scale = crop_h / oh
    a0 = np.where(flip, -sx_scale, sx_scale)
    b0 = np.where(flip, crop_x + (ow - 0.5) * sx_scale - 0.5,
                  crop_x + 0.5 * sx_scale - 0.5)
    a1 = sy_scale
    b1 = crop_y + 0.5 * sy_scale - 0.5

    cx, cy = (w0 - 1) / 2.0, (h0 - 1) / 2.0
    cos, sin = np.cos(angle), np.sin(angle)
    mats = np.empty((n, 2, 3), np.float32)
    mats[:, 0, 0] = cos * a0
    mats[:, 0, 1] = -sin * a1
    mats[:, 0, 2] = cos * (b0 - cx) - sin * (b1 - cy) + cx
    mats[:, 1, 0] = sin * a0
    mats[:, 1, 1] = cos * a1
    mats[:, 1, 2] = sin * (b0 - cx) + cos * (b1 - cy) + cy
    return mats


def make_host_warp_transform(cfg: AugmentConfig, label_lut: np.ndarray, seed: int,
                             emit_position_labels: bool = False,
                             rank: int = 0):
    """Host-side warp for the Loader's decode threads: samples per-batch
    affine matrices (deterministic in (seed, epoch, batch)) and runs the
    native C++ bilinear/nearest warp with fused label LUT.

    Rationale: profiling the all-device augment showed its dynamic gathers
    cost ~320 ms/step on TPU (4M-row gathers run at ~20M elem/s while the MXU
    idles); the same warp is ~10 ms on host threads and overlaps with device
    compute through the loader's prefetch.

    ``emit_position_labels``: also return the fused tail kernel's
    g16-major label operand as a third element (native dp_labels_g16_t,
    ~3 ms — the identical permutation costs ~7 ms of DEVICE time per step
    when XLA builds it next to the pallas consumer)."""
    from .native import warp_pair_batch, labels_g16_t

    # The Loader calls set_native_threads() with its per-worker core budget
    # (cores // num_workers): this transform runs INSIDE the decode pool, so
    # letting the native calls take their standalone default (min(8, cores))
    # would spawn num_workers x default threads and thrash the host CPUs.
    state = {'threads': None}
    # Multi-process: mix the RANK into the stream, or every process would
    # draw the SAME per-batch warp matrices at each (epoch, batch_index) and
    # the global batch's augmentation diversity shrinks by world_size (the
    # reference's per-worker DataLoader RNGs are independent).  rank 0 keeps
    # the historical [seed, epoch, batch] stream so single-process draws are
    # unchanged.
    rank_entropy = [rank] if rank else []

    def transform(epoch, batch_index, imgs_u8, segs_u8):
        r = np.random.default_rng(np.random.SeedSequence(
            rank_entropy + [seed, epoch, batch_index]))
        mats = sample_affine_matrices_np(r, imgs_u8.shape[0], imgs_u8.shape[1:3],
                                         cfg.output_hw, cfg)
        imgs_w, segs_w = warp_pair_batch(imgs_u8, segs_u8, mats, cfg.output_hw,
                                         lut=label_lut, threads=state['threads'])
        if not emit_position_labels:
            return imgs_w, segs_w
        return imgs_w, segs_w, labels_g16_t(segs_w, threads=state['threads'])

    transform.set_native_threads = lambda n: state.__setitem__('threads', n)
    return transform


def _photometric_params(key, cfg: AugmentConfig, jitter_on: bool, std,
                        gray_mix):
    """Per-sample blur taps + folded color affine, one key -> (taps (3,),
    m (3, 3), k_jit).  Shared by the XLA and Pallas photometric paths so
    both draw identical decisions from the same key (stream layout:
    blur_p, blur_sigma, gray, jitter)."""
    k_blur_p, k_blur_s, k_gray, k_jit = jax.random.split(key, 4)
    do_blur = jax.random.bernoulli(k_blur_p, cfg.blur_p)
    sigma = jax.random.uniform(k_blur_s, (), minval=cfg.blur_sigma[0],
                               maxval=cfg.blur_sigma[1])
    x = jnp.array([-1.0, 0.0, 1.0])
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    taps = jnp.where(do_blur, g / g.sum(), jnp.array([0.0, 1.0, 0.0]))
    do_gray = jax.random.bernoulli(k_gray, cfg.grayscale_p)
    m = jnp.where(do_gray, jnp.broadcast_to(gray_mix[:, None], (3, 3)),
                  jnp.eye(3, dtype=jnp.float32))
    scale = 1.0 if jitter_on else 1.0 / 255.0
    return taps, m * scale / std[None, :], k_jit


def make_device_post_fn(cfg: AugmentConfig, dtype=jnp.float32,
                        unshuffle_hi: int = 0, mesh=None,
                        photometric: str = 'auto'):
    """Device-side tail of the host-warp path: photometric ops + normalize +
    the model-input downscale, built exclusively from elementwise math and
    matmul resizes — zero gathers in the TPU program.

    The photometric chain is algebraically folded so every random op costs
    one full-resolution pass instead of a compute-then-select pair (each
    select alone read+wrote ~226 MB/step at the reference shapes):

    * the blur's ``where(do_blur, blur3(img), img)`` becomes per-sample TAPS
      — the gaussian taps when blurring, ``(0, 1, 0)`` otherwise.  Identity
      taps reproduce the unblurred image BIT-exactly (0*a + 1*b + 0*c = b),
      so the fold is not an approximation;
    * grayscale + normalize (+ the u8 ``/255`` when ColorJitter is off, its
      recipe state) fold into ONE per-sample affine color transform
      ``img @ M + b``: M = (gray mix or identity) * scale / std,
      b = -mean/std.  Same math, one pass.

    ``dtype``: emission dtype of the normalized images.  Under bf16 mixed
    precision the model casts its input immediately anyway, and the MSE
    target (img_hi, 100 MB/step in f32 at the reference shapes) feeds a loss
    whose reduction runs in f32 regardless — emitting bf16 halves the
    relayout copies around the augment tail (traced ~1.4 + 0.9 ms/step on
    v5e).  All photometric math stays in f32; only the final write narrows.

    ``unshuffle_hi``: when nonzero (the SISR pixel-shuffle factor, 8), emit
    ``img_hi`` already pixel-UNSHUFFLED — (B, H/r, W/r, 3*r*r) — so the MSE
    against the pre-shuffle SISR output needs no in-loss permutation.  The
    emission write costs the same bytes either way; the separate transpose
    it replaces was ~0.5 ms/step plus a 0.5 ms relayout copy feeding it
    (train/steps.py reads the factor off the returned fn).

    ``photometric``: 'pallas' runs the taps+affine chain as ONE Pallas pass
    over planar strips (ops/pallas/augment_post.py; u8 in, compute dtype
    out, ~2.8 -> ~0.3 ms/step on v5e); 'xla' keeps the jnp formulation;
    'auto' picks pallas on the TPU backend when ColorJitter is off (its
    recipe state — the jitter's clipped, order-shuffled ops don't fold)
    AND a mesh without a >1 'spatial' axis was passed (see the gating
    comment below; every production caller passes its mesh).
    Both paths draw identical per-sample decisions from the same key; the
    pallas path resizes img_lo from the compute-dtype (bf16) image instead
    of f32, a sub-ulp-of-bf16 input difference.  Pass ``mesh`` on
    multi-device runs: pallas_call has no GSPMD partitioning rule, so the
    kernel is shard_mapped over the batch like the fused tails."""
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    oh, ow = cfg.output_hw
    ih, iw = cfg.input_hw
    exact2x = (oh == 2 * ih and ow == 2 * iw)
    jitter_on = any(cfg.color_jitter)
    gray_mix = jnp.array(_LUMA, jnp.float32)
    coff = -mean / std

    if photometric not in ('auto', 'pallas', 'xla'):
        raise ValueError("photometric must be auto|pallas|xla, got {!r}"
                         .format(photometric))
    if photometric == 'pallas' and jitter_on:
        raise ValueError("photometric='pallas' cannot apply ColorJitter "
                         "(its clipped, order-shuffled ops don't fold); "
                         "use 'xla' or disable the jitter")
    if photometric == 'pallas' and (oh % 8 or ow % 128):
        # The same tile gate 'auto' applies silently — explicit requests get
        # the diagnosis at construction instead of a bare kernel shape
        # assert at the first jitted dispatch.
        raise ValueError(
            "photometric='pallas' needs output_hw with H % 8 == 0 and "
            "W % 128 == 0 (the kernel's 8-row reflect-halo strips on "
            "128-wide lanes), got {}x{}; use 'xla'".format(oh, ow))
    from ..utils.backend import resolve_backend
    on_tpu = resolve_backend() == 'tpu'
    # 'auto' takes the kernel only when it can be shard_mapped correctly:
    # pallas_call has no GSPMD partitioning rule, so without a mesh a
    # multi-device run would gather the full global batch onto every device;
    # and on a spatial mesh the batch arrives P('data','spatial')-sharded
    # while the kernel's shard_map covers 'data' only (full-height strips —
    # the blur halo crosses any H split), which would allgather + recompute
    # over 'spatial' every step.  Both fall back to the XLA formulation,
    # like the fused tails do (train/steps.py).  Explicit 'pallas' is
    # honored as requested (correct under resharding, just not free).
    spatial_on = mesh is not None and mesh.shape.get('spatial', 1) > 1
    use_pallas = (photometric == 'pallas'
                  or (photometric == 'auto' and on_tpu and not jitter_on
                      and oh % 8 == 0 and ow % 128 == 0
                      and mesh is not None and not spatial_on))

    def params_of(keys):
        return jax.vmap(
            lambda k: _photometric_params(k, cfg, jitter_on, std, gray_mix)
        )(keys)

    def one_sample(img, taps, m, k_jit):
        if jitter_on:
            img = _color_jitter(img, k_jit, cfg)
        pad_h = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode='reflect')
        img = pad_h[:-2] * taps[0] + pad_h[1:-1] * taps[1] + pad_h[2:] * taps[2]
        pad_w = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode='reflect')
        img = pad_w[:, :-2] * taps[0] + pad_w[:, 1:-1] * taps[1] + pad_w[:, 2:] * taps[2]
        # HIGHEST: the TPU default would run this K=3 contraction in bf16,
        # costing ~0.8% on the normalized image where the pre-fold
        # elementwise formulation (and the Pallas kernel's VPU math) is f32.
        return jnp.einsum('hwc,cd->hwd', img, m,
                          precision=jax.lax.Precision.HIGHEST) + coff

    def photometric_pallas(imgs_w_u8, keys):
        """-> planar hi.  (An in-kernel unshuffled second emission was
        built and REJECTED: Mosaic cannot lower the lane-splitting rank-5
        shape cast — see ops/pallas/augment_post.py — so the MSE-target
        permutation stays the XLA transpose below.)"""
        from ..ops.pallas.augment_post import photometric_planar
        taps, m, _ = params_of(keys)
        b = imgs_w_u8.shape[0]
        coffb = jnp.broadcast_to(coff[None, :], (b, 3))
        planar = jnp.transpose(imgs_w_u8, (0, 3, 1, 2))
        call = functools.partial(photometric_planar, out_dtype=dtype,
                                 interpret=not on_tpu)
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import PartitionSpec as P
            call = jax.shard_map(
                call, mesh=mesh,
                in_specs=(P('data'), P('data'), P('data'), P('data')),
                out_specs=P('data'), check_vma=False)
        return call(planar, taps, m, coffb)

    @jax.jit
    def post(imgs_w_u8, segs_w_u8, key):
        keys = jax.random.split(key, imgs_w_u8.shape[0])
        if use_pallas:
            hi_planar = photometric_pallas(imgs_w_u8, keys)
            img_lo = jnp.transpose(
                resize_bilinear_matmul_hw(hi_planar, cfg.input_hw),
                (0, 2, 3, 1))
            if unshuffle_hi:
                # planar -> pixel_unshuffle's (B, H/r, W/r, 3*r*r): channel
                # c*r*r + i*r + j = full-res pixel (r*h + i, r*w + j) of c.
                r = unshuffle_hi
                b = hi_planar.shape[0]
                x = hi_planar.reshape(b, 3, oh // r, r, ow // r, r)
                img_hi = x.transpose(0, 2, 4, 1, 3, 5).reshape(
                    b, oh // r, ow // r, 3 * r * r)
            else:
                img_hi = jnp.transpose(hi_planar, (0, 2, 3, 1))
        else:
            img = imgs_w_u8.astype(jnp.float32)
            if jitter_on:
                img = img / 255.0   # jitter clips in [0,1]; /255 can't fold
            taps, m, k_jit = params_of(keys)
            img_hi = jax.vmap(one_sample)(img, taps, m, k_jit)
            img_lo = resize_bilinear_matmul(img_hi, cfg.input_hw).astype(dtype)
            img_hi = img_hi.astype(dtype)
            if unshuffle_hi:
                from ..ops.conv import pixel_unshuffle
                img_hi = pixel_unshuffle(img_hi, unshuffle_hi)
        seg_hi = segs_w_u8.astype(jnp.int32)
        if exact2x:
            seg_lo = seg_hi[:, ::2, ::2]
        else:
            seg_lo = resize_nearest(seg_hi, cfg.input_hw, spatial_axes=(-2, -1))
        return (img_lo, img_hi), (seg_hi, seg_lo)

    if photometric == 'pallas' and mesh is None:
        # Honored as requested, but pallas_call has no GSPMD rule: on >1
        # devices the full global batch is gathered onto every device (the
        # hazard the 'auto' gate exists to prevent).  The device-count probe
        # can BLOCK for minutes when the backend tunnel is wedged
        # (utils/backend.py), so it runs at first DISPATCH — where the
        # caller is committing to the backend anyway — never at
        # construction, which must stay offline-safe.
        jitted, warned = post, []

        def post(imgs_w_u8, segs_w_u8, key):
            if not warned:
                warned.append(True)
                import jax as _jax
                if _jax.device_count() > 1:
                    from ..utils.logging import CAUTION
                    print(CAUTION(
                        "photometric='pallas' without a mesh on a {}-device "
                        "backend: the kernel cannot be shard_mapped, so every "
                        "device gathers the full global batch each step. "
                        "Pass mesh= or use 'auto'."
                        .format(_jax.device_count())))
            return jitted(imgs_w_u8, segs_w_u8, key)

    post.unshuffled_hi_factor = int(unshuffle_hi)
    post.photometric_impl = 'pallas' if use_pallas else 'xla'
    return post


def make_eval_transform_fn(cfg: AugmentConfig, label_lut: np.ndarray):
    """Exact reference val/test pipeline (train_or_resume.py:156-158):
    LUT label mapping -> normalize -> JointScaledImage (align-corners bilinear
    for images at input/output sizes, torch-nearest for the seg at output
    size).  No randomness."""
    lut = jnp.asarray(label_lut)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)

    @jax.jit
    def transform(images_u8, segs_u8):
        img = images_u8.astype(jnp.float32) / 255.0
        img = (img - mean) / std
        seg = jnp.take(lut, segs_u8.astype(jnp.int32), axis=0).astype(jnp.int32)
        # matmul-form resizes are numerically identical to the gather form
        # (same two-term lerp) but avoid TPU dynamic-gather slow paths.
        img_lo = resize_bilinear_matmul(img, cfg.input_hw)
        img_hi = resize_bilinear_matmul(img, cfg.output_hw)
        seg_hi = resize_nearest(seg, cfg.output_hw, spatial_axes=(-2, -1))
        return (img_lo, img_hi), (seg_hi, seg)

    return transform
