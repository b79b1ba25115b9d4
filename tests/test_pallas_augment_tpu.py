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
