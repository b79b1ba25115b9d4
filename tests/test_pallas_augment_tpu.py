"""Compiled (Mosaic) photometric kernel vs the XLA formulation, ON TPU.

The interpret-mode tests (tests/test_pallas_augment.py) pin the kernel's
math; this file pins the *compiled* kernel so Mosaic layout/roll/cast bugs
surface at test time instead of as an augmentation anomaly in a training
run.  Skipped unless the session runs on real TPU hardware:

    DSRL_TPU_TESTS_ON_TPU=1 python -m pytest tests/test_pallas_augment_tpu.py -q
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualsuperreslearningforsemseg_tpu.data import AugmentConfig
from dualsuperreslearningforsemseg_tpu.data.augment import make_device_post_fn

pytestmark = pytest.mark.skipif(jax.default_backend() != 'tpu',
                                reason="needs real TPU (set DSRL_TPU_TESTS_ON_TPU=1)")


def test_compiled_photometric_matches_xla():
    # The XLA reference path's color-affine einsum runs at the TPU default
    # bf16 matmul precision (measured ~0.8% everywhere); the kernel's VPU
    # math is pure f32.  Pin the reference to f32 precision so the
    # comparison tests the KERNEL, not XLA's matmul rounding.
    rng = np.random.default_rng(23)
    cfg = AugmentConfig(input_hw=(32, 64), output_hw=(64, 128),
                        blur_p=0.5, grayscale_p=0.5)
    with jax.default_matmul_precision('float32'):
        post_x = make_device_post_fn(cfg, photometric='xla')
        post_p = make_device_post_fn(cfg, photometric='pallas')
        imgs = jnp.asarray(rng.integers(0, 256, (8, 64, 128, 3)), jnp.uint8)
        segs = jnp.asarray(rng.integers(0, 19, (8, 64, 128)), jnp.uint8)
        key = jax.random.PRNGKey(29)
        (lo_x, hi_x), _ = jax.block_until_ready(post_x(imgs, segs, key))
        (lo_p, hi_p), _ = jax.block_until_ready(post_p(imgs, segs, key))
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_x),
                               rtol=1e-4, atol=1e-4)


def test_compiled_photometric_unshuffled():
    rng = np.random.default_rng(31)
    cfg = AugmentConfig(input_hw=(32, 64), output_hw=(64, 128),
                        blur_p=1.0, grayscale_p=0.0)
    with jax.default_matmul_precision('float32'):
        post_x = make_device_post_fn(cfg, unshuffle_hi=8, photometric='xla')
        post_p = make_device_post_fn(cfg, unshuffle_hi=8,
                                     photometric='pallas')
        imgs = jnp.asarray(rng.integers(0, 256, (4, 64, 128, 3)), jnp.uint8)
        segs = jnp.asarray(rng.integers(0, 19, (4, 64, 128)), jnp.uint8)
        key = jax.random.PRNGKey(37)
        (_, hi_x), _ = jax.block_until_ready(post_x(imgs, segs, key))
        (_, hi_p), _ = jax.block_until_ready(post_p(imgs, segs, key))
    assert hi_p.shape == (4, 8, 16, 192)
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_x),
                               rtol=1e-5, atol=1e-5)


def test_colorjitter_train_path_on_tpu():
    """The ColorJitter branch (data/augment.py::_color_jitter) had only ever
    run on CPU (the reference ships it commented out of the pipeline,
    JointColorJitter.py:58-101); this pins the COMPILED TPU path: it must
    lower, agree with the same program on the in-process CPU backend, and
    its per-batch device cost gets recorded (README "Measured performance").
    """
    import time
    rng = np.random.default_rng(41)
    cfg = AugmentConfig(input_hw=(256, 512), output_hw=(512, 1024),
                        blur_p=0.5, grayscale_p=0.1,
                        color_jitter=(0.25, 0.25, 0.25, 0.1))
    imgs_h = rng.integers(0, 256, (16, 512, 1024, 3)).astype(np.uint8)
    segs_h = rng.integers(0, 19, (16, 512, 1024)).astype(np.uint8)
    key = jax.random.PRNGKey(43)

    with jax.default_matmul_precision('float32'):
        post = make_device_post_fn(cfg, photometric='auto')
        assert post.photometric_impl == 'xla'  # CJ forces the XLA fallback

        cpu = jax.devices('cpu')[0]
        tpu_out = jax.block_until_ready(post(jnp.asarray(imgs_h),
                                             jnp.asarray(segs_h), key))
        with jax.default_device(cpu):
            cpu_out = jax.block_until_ready(
                post(jax.device_put(imgs_h, cpu), jax.device_put(segs_h, cpu),
                     jax.device_put(key, cpu)))

    (lo_t, hi_t), (sh_t, _) = tpu_out
    (lo_c, hi_c), (sh_c, _) = cpu_out
    np.testing.assert_allclose(np.asarray(hi_t), np.asarray(hi_c),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lo_t), np.asarray(lo_c),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(sh_t), np.asarray(sh_c))

    # Record the cost: batch-16 photometric with CJ on vs off.  Device
    # arrays hoisted out of the loop — through the remote tunnel a per-call
    # jnp.asarray would re-stage ~35 MB and swamp the compute time.
    imgs_d, segs_d = jnp.asarray(imgs_h), jnp.asarray(segs_h)

    def timed(p):
        out = jax.block_until_ready(p(imgs_d, segs_d, key))
        t0 = time.perf_counter()
        for _ in range(10):
            out = jax.block_until_ready(p(imgs_d, segs_d, key))
        return (time.perf_counter() - t0) / 10 * 1000.0
    cj_ms = timed(post)
    cfg_off = AugmentConfig(input_hw=(256, 512), output_hw=(512, 1024),
                            blur_p=0.5, grayscale_p=0.1)
    off_ms = timed(make_device_post_fn(cfg_off, photometric='xla'))
    print("\nColorJitter XLA photometric: {:.2f} ms/batch16 (CJ off: {:.2f})"
          .format(cj_ms, off_ms))
    assert np.isfinite(cj_ms) and cj_ms < 1000.0
