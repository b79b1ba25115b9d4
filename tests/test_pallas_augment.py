"""Pallas photometric kernel (ops/pallas/augment_post.py): interpret-mode
parity vs the XLA taps+affine formulation, full-res and unshuffled
emissions, and the shard_mapped multi-device form."""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.data import AugmentConfig
from dualsuperreslearningforsemseg_tpu.data.augment import make_device_post_fn


def _mk(photometric, unshuffle=0, mesh=None, dtype=jnp.float32):
    cfg = AugmentConfig(input_hw=(16, 64), output_hw=(32, 128),
                        blur_p=0.5, grayscale_p=0.5)
    return make_device_post_fn(cfg, dtype=dtype, unshuffle_hi=unshuffle,
                               mesh=mesh, photometric=photometric), cfg


def _batch(rng, b=8, hw=(32, 128)):
    imgs = jnp.asarray(rng.integers(0, 256, (b, *hw, 3)), jnp.uint8)
    segs = jnp.asarray(rng.integers(0, 19, (b, *hw)), jnp.uint8)
    return imgs, segs


def test_pallas_post_matches_xla(rng):
    post_x, _ = _mk('xla')
    post_p, _ = _mk('pallas')
    assert post_x.photometric_impl == 'xla'
    assert post_p.photometric_impl == 'pallas'
    imgs, segs = _batch(rng)
    key = jax.random.PRNGKey(9)
    (lo_x, hi_x), (sh_x, sl_x) = post_x(imgs, segs, key)
    (lo_p, hi_p), (sh_p, sl_p) = post_p(imgs, segs, key)
    # identical per-sample decisions and math; resize input precision is the
    # only deviation (f32 vs emission dtype) and dtype=f32 removes it here
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sh_p), np.asarray(sh_x))
    np.testing.assert_array_equal(np.asarray(sl_p), np.asarray(sl_x))


def test_pallas_post_unshuffled_emission(rng):
    post_x, _ = _mk('xla', unshuffle=4)
    post_p, _ = _mk('pallas', unshuffle=4)
    imgs, segs = _batch(rng)
    key = jax.random.PRNGKey(11)
    (_, hi_x), _ = post_x(imgs, segs, key)
    (_, hi_p), _ = post_p(imgs, segs, key)
    assert hi_p.shape == (8, 8, 32, 48)
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_x),
                               rtol=1e-6, atol=1e-6)


def test_pallas_post_sharded(rng):
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size > 1, 'conftest provides the 8-device CPU mesh'
    from jax.sharding import NamedSharding, PartitionSpec as P
    post_x, _ = _mk('xla')
    post_p, _ = _mk('pallas', mesh=mesh)
    imgs, segs = _batch(rng)
    key = jax.random.PRNGKey(13)
    (lo_x, hi_x), _ = post_x(imgs, segs, key)
    sh4 = NamedSharding(mesh, P('data'))
    imgs_s = jax.device_put(imgs, sh4)
    segs_s = jax.device_put(segs, sh4)
    (lo_p, hi_p), _ = post_p(imgs_s, segs_s, key)
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_x),
                               rtol=1e-6, atol=1e-6)


def test_pallas_post_rejects_colorjitter():
    """photometric='pallas' + ColorJitter is a contract violation: the
    jitter's clipped, order-shuffled ops don't fold into the kernel's
    affine color transform, so the request must fail loudly instead of
    silently dropping the jitter."""
    import pytest
    cfg = AugmentConfig(input_hw=(16, 64), output_hw=(32, 128),
                        color_jitter=(0.3, 0.0, 0.0, 0.0))
    with pytest.raises(ValueError, match='ColorJitter'):
        make_device_post_fn(cfg, photometric='pallas')
    # 'auto' with jitter on must quietly pick the XLA formulation
    post = make_device_post_fn(cfg, photometric='auto')
    assert post.photometric_impl == 'xla'


def test_auto_selection_gating(monkeypatch):
    """'auto' takes the kernel only when it can shard_map it: a mesh is
    required (pallas_call has no GSPMD rule — no mesh on a multi-device run
    would gather the global batch onto every device) and a >1 'spatial'
    axis falls back like the fused tails do."""
    from dualsuperreslearningforsemseg_tpu.utils import backend
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh
    monkeypatch.setattr(backend, 'resolve_backend', lambda: 'tpu')
    cfg = AugmentConfig(input_hw=(16, 64), output_hw=(32, 128))
    assert make_device_post_fn(cfg, photometric='auto').photometric_impl \
        == 'xla'                                     # no mesh
    assert make_device_post_fn(cfg, photometric='auto',
                               mesh=make_mesh()).photometric_impl \
        == 'pallas'                                  # data-only mesh
    import jax as _jax
    spatial_mesh = make_mesh(_jax.devices()[:8], spatial=2)
    assert make_device_post_fn(cfg, photometric='auto',
                               mesh=spatial_mesh).photometric_impl \
        == 'xla'                                     # spatial mesh


def test_kernel_unshuffle_branch_interpret(rng):
    """Direct interpret-mode check of photometric_planar(unshuffle=r) — the
    in-kernel second emission.  Production keeps the MSE-target permutation
    as an XLA transpose (Mosaic can't lower the rank-5 lane-splitting shape
    cast), so this branch is only reachable here; the test keeps it from
    rotting until Mosaic learns the relayout."""
    from dualsuperreslearningforsemseg_tpu.ops.pallas.augment_post import (
        photometric_planar)
    b, h, w, r = 2, 16, 128, 4
    imgs = jnp.asarray(rng.integers(0, 256, (b, 3, h, w)), jnp.uint8)
    taps = jnp.tile(jnp.asarray([[0.25, 0.5, 0.25]], jnp.float32), (b, 1))
    cmat = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] / 255.0, (b, 1, 1))
    coff = jnp.zeros((b, 3), jnp.float32)
    full, unsh = photometric_planar(imgs, taps, cmat, coff,
                                    out_dtype=jnp.float32, interpret=True,
                                    unshuffle=r)
    assert unsh.shape == (b, h // r, w // r, 3 * r * r)
    # torch PixelUnshuffle channel order: (c, i, j) fastest-varying j.
    want = np.asarray(full).reshape(b, 3, h // r, r, w // r, r)
    want = want.transpose(0, 2, 4, 1, 3, 5).reshape(b, h // r, w // r, -1)
    np.testing.assert_allclose(np.asarray(unsh), want, rtol=1e-6, atol=1e-6)


def test_pallas_post_bf16_emission(rng):
    """bf16 emission: the kernel's hi equals the XLA path's bf16 hi (same
    f32 math, same final narrowing)."""
    post_x, _ = _mk('xla', dtype=jnp.bfloat16)
    post_p, _ = _mk('pallas', dtype=jnp.bfloat16)
    imgs, segs = _batch(rng)
    key = jax.random.PRNGKey(17)
    (_, hi_x), _ = post_x(imgs, segs, key)
    (_, hi_p), _ = post_p(imgs, segs, key)
    np.testing.assert_allclose(
        np.asarray(hi_p, np.float32), np.asarray(hi_x, np.float32),
        rtol=0.02, atol=0.02)
    exact = np.mean(np.asarray(hi_p, np.float32)
                    == np.asarray(hi_x, np.float32))
    assert exact > 0.95, exact


def test_pallas_without_mesh_warns_at_dispatch_not_construction(rng, capsys):
    """Explicit photometric='pallas' with mesh=None on a multi-device
    backend: the kernel cannot be shard_mapped, so the post fn CAUTIONs —
    but only at the first dispatch.  Construction must stay offline-safe
    (no device probe: jax.device_count() can block for minutes on a wedged
    backend tunnel, utils/backend.py), and the warning fires once, not per
    step."""
    post_p, _ = _mk('pallas')          # 8-device CPU backend via conftest
    capsys.readouterr()
    assert post_p.photometric_impl == 'pallas'   # attrs live on the wrapper
    assert capsys.readouterr().out == ''         # constructing didn't warn
    imgs, segs = _batch(rng)
    post_p(imgs, segs, jax.random.PRNGKey(3))
    assert 'shard_mapped' in capsys.readouterr().out
    post_p(imgs, segs, jax.random.PRNGKey(4))
    assert 'shard_mapped' not in capsys.readouterr().out
