"""Data layer tests: reader, sampler parity, device augmentation, eval
transform exactness."""

import numpy as np
import jax
import jax.numpy as jnp
import torch as t
import torch.nn.functional as F

from dualsuperreslearningforsemseg_tpu.data import (
    CityscapesDataset, make_synthetic_cityscapes_tree, SyntheticDataset,
    make_train_augment_fn, make_eval_transform_fn, AugmentConfig, Loader,
    ShardedSampler)
from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs


def small_cfg():
    return AugmentConfig(input_hw=(32, 64), output_hw=(64, 128))


def test_reader_finds_pairs(tmp_path):
    make_synthetic_cityscapes_tree(str(tmp_path), split='train', num_images=3)
    ds = CityscapesDataset(str(tmp_path), split='train')
    assert len(ds) == 3
    img, seg = ds[0]
    assert img.shape == (64, 128, 3) and img.dtype == np.uint8
    assert seg.shape == (64, 128) and seg.dtype == np.uint8


def test_sampler_matches_torch_distributed_sampler():
    """Shards must be disjoint and cover the drop_last-truncated set."""
    s0 = ShardedSampler(103, world_size=4, rank=0, shuffle=True, seed=7)
    shards = [ShardedSampler(103, world_size=4, rank=r, shuffle=True, seed=7)
              .indices_for_epoch(5) for r in range(4)]
    allidx = np.concatenate(shards)
    assert len(allidx) == 100  # 103 -> 100 with drop_last over 4 ranks
    assert len(set(allidx.tolist())) == 100
    # deterministic per epoch+seed
    again = ShardedSampler(103, 4, 0, True, 7).indices_for_epoch(5)
    np.testing.assert_array_equal(shards[0], again)
    assert not np.array_equal(s0.indices_for_epoch(5), s0.indices_for_epoch(6))


def test_train_augment_shapes_and_labels(rng):
    cfg = small_cfg()
    aug = make_train_augment_fn(cfg, cs.LABEL_MAPPING_LUT)
    imgs = rng.integers(0, 256, size=(2, 64, 128, 3), dtype=np.uint8)
    segs = rng.integers(0, 34, size=(2, 64, 128), dtype=np.uint8)
    (img_lo, img_hi), (seg_hi, seg_lo) = aug(jnp.asarray(imgs), jnp.asarray(segs),
                                             jax.random.PRNGKey(0))
    assert img_lo.shape == (2, 32, 64, 3)
    assert img_hi.shape == (2, 64, 128, 3)
    assert seg_hi.shape == (2, 64, 128)
    valid = np.unique(np.asarray(seg_hi))
    assert set(valid.tolist()) <= set(range(19)) | {255}
    assert np.isfinite(np.asarray(img_lo)).all()


def test_train_augment_is_seeded(rng):
    cfg = small_cfg()
    aug = make_train_augment_fn(cfg, cs.LABEL_MAPPING_LUT)
    imgs = jnp.asarray(rng.integers(0, 256, size=(1, 64, 128, 3), dtype=np.uint8))
    segs = jnp.asarray(rng.integers(0, 34, size=(1, 64, 128), dtype=np.uint8))
    a = aug(imgs, segs, jax.random.PRNGKey(3))
    b = aug(imgs, segs, jax.random.PRNGKey(3))
    c = aug(imgs, segs, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a[0][0]), np.asarray(b[0][0]))
    assert not np.array_equal(np.asarray(a[0][0]), np.asarray(c[0][0]))


def test_eval_transform_matches_reference_pipeline(rng):
    """Eval path must reproduce the reference's val transforms numerically:
    LUT -> ToTensor+Normalize -> align-corners bilinear / nearest resizes."""
    cfg = small_cfg()
    tx = make_eval_transform_fn(cfg, cs.LABEL_MAPPING_LUT)
    imgs = rng.integers(0, 256, size=(1, 64, 128, 3), dtype=np.uint8)
    segs = rng.integers(0, 34, size=(1, 64, 128), dtype=np.uint8)
    (img_lo, img_hi), (seg_hi, seg_orig) = tx(jnp.asarray(imgs), jnp.asarray(segs))

    # torch golden
    img_t = t.from_numpy(imgs.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    mean = t.tensor(cs.MEAN).view(1, 3, 1, 1)
    std = t.tensor(cs.STD).view(1, 3, 1, 1)
    img_t = (img_t - mean) / std
    img_lo_t = F.interpolate(img_t, size=cfg.input_hw, mode='bilinear', align_corners=True)
    img_hi_t = F.interpolate(img_t, size=cfg.output_hw, mode='bilinear', align_corners=True)
    seg_mapped = cs.LABEL_MAPPING_LUT[segs]
    seg_hi_t = F.interpolate(t.from_numpy(seg_mapped.astype(np.float32))[:, None],
                             size=cfg.output_hw, mode='nearest')[:, 0]

    np.testing.assert_allclose(np.asarray(img_lo), img_lo_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img_hi), img_hi_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(seg_hi), seg_hi_t.numpy().astype(np.int32))
    np.testing.assert_array_equal(np.asarray(seg_orig), seg_mapped.astype(np.int32))


def test_identity_affine_recovers_resize(rng):
    """With rotation=0, scale=1, no flip, the warp must equal a plain
    center-convention bilinear resize (sanity of the affine composition)."""
    cfg = AugmentConfig(input_hw=(32, 64), output_hw=(64, 128), degrees=0.0,
                        min_scale=1.0, max_scale=1.0 + 1e-9, hflip_p=0.0,
                        blur_p=0.0, grayscale_p=0.0)
    aug = make_train_augment_fn(cfg, cs.LABEL_MAPPING_LUT)
    imgs = rng.integers(0, 256, size=(1, 64, 128, 3), dtype=np.uint8)
    segs = np.zeros((1, 64, 128), dtype=np.uint8)
    (_, img_hi), _ = aug(jnp.asarray(imgs), jnp.asarray(segs), jax.random.PRNGKey(0))
    # output_hw == source size and identity transform -> exact passthrough
    expected = (imgs.astype(np.float32) / 255.0 - np.array(cfg.mean)) / np.array(cfg.std)
    np.testing.assert_allclose(np.asarray(img_hi), expected, rtol=1e-4, atol=1e-4)


def test_loader_yields_all_batches(tmp_path):
    ds = SyntheticDataset(num_images=10, size_hw=(16, 32))
    loader = Loader(ds, batch_size=3, shuffle=True, drop_last=True, num_workers=2)
    batches = list(iter(loader))
    assert len(batches) == 3 == len(loader)
    for imgs, segs in batches:
        assert imgs.shape == (3, 16, 32, 3)
        assert segs.shape == (3, 16, 32)


def test_loader_epoch_reshuffles():
    ds = SyntheticDataset(num_images=8, size_hw=(4, 8), seed=1)
    loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True, num_workers=1)
    loader.set_epoch(1)
    b1 = next(iter(loader))[0]
    loader.set_epoch(2)
    b2 = next(iter(loader))[0]
    assert not np.array_equal(b1, b2)


def test_color_jitter_component(rng):
    """Reference-parity color jitter: bounded output, identity when factors
    are 0, changes pixels when enabled (JointColorJitter.py:58-101)."""
    import jax
    from dualsuperreslearningforsemseg_tpu.data.augment import _color_jitter
    cfg = AugmentConfig(color_jitter=(0.4, 0.4, 0.4, 0.4))
    img = jnp.asarray(rng.random((16, 24, 3), dtype=np.float32))
    out = _color_jitter(img, jax.random.PRNGKey(0), cfg)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert not np.allclose(np.asarray(out), np.asarray(img))

    cfg0 = AugmentConfig(color_jitter=(0.0, 0.0, 0.0, 0.0))
    out0 = _color_jitter(img, jax.random.PRNGKey(0), cfg0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(img))


def test_color_jitter_hue_matches_torch_rotation(rng):
    """Hue rotation must match the reference's RGB rotation-matrix math."""
    import jax
    from dualsuperreslearningforsemseg_tpu.data.augment import _color_jitter
    img = rng.random((8, 8, 3)).astype(np.float32)
    hue_factor = 0.23
    angle = hue_factor * 2.0 * np.pi
    cosA, sinA = np.cos(angle), np.sin(angle)
    third, sq3 = 1.0 / 3.0, np.sqrt(1.0 / 3.0)
    m = np.array([
        [cosA + (1 - cosA) * third, third * (1 - cosA) - sq3 * sinA, third * (1 - cosA) + sq3 * sinA],
        [third * (1 - cosA) + sq3 * sinA, cosA + third * (1 - cosA), third * (1 - cosA) - sq3 * sinA],
        [third * (1 - cosA) - sq3 * sinA, third * (1 - cosA) + sq3 * sinA, cosA + third * (1 - cosA)]])
    expected = np.clip(img @ m, 0.0, 1.0)
    # drive through the full op with only hue enabled and a pinned factor
    import dualsuperreslearningforsemseg_tpu.data.augment as aug_mod
    orig_uniform = jax.random.uniform
    def pinned_uniform(key, shape=(), **kw):
        if kw.get('minval') == -0.5 and kw.get('maxval') == 0.5:
            return jnp.float32(hue_factor)
        return orig_uniform(key, shape, **kw)
    aug_mod.jax.random = jax.random  # no-op; use cfg with h=0.5 then pin
    cfg = AugmentConfig(color_jitter=(0.0, 0.0, 0.0, 0.5))
    jax_random_uniform = jax.random.uniform
    try:
        jax.random.uniform = pinned_uniform
        out = aug_mod._color_jitter(jnp.asarray(img), jax.random.PRNGKey(1), cfg)
    finally:
        jax.random.uniform = jax_random_uniform
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_sharded_sampler_pads_cyclically_and_marks_duplicates():
    """drop_last=False must give every rank the SAME shard length (unequal
    lengths deadlock collective eval) while marking the cyclic pad entries
    negative so nothing is double-counted (the torch DistributedSampler it
    replaces double-counts its duplicates)."""
    from dualsuperreslearningforsemseg_tpu.data.pipeline import ShardedSampler

    # Cityscapes-val-like: 500 images over 8 ranks -> 4 duplicates.
    shards = [ShardedSampler(500, world_size=8, rank=r, shuffle=False,
                             drop_last=False).indices_for_epoch(0)
              for r in range(8)]
    assert {len(s) for s in shards} == {63}
    flat = np.concatenate(shards)
    real = flat[flat >= 0]
    pads = flat[flat < 0]
    assert sorted(real.tolist()) == list(range(500))
    assert len(pads) == 4
    assert all(0 <= -(p + 1) < 500 for p in pads)

    # Fewer samples than ranks: cyclic wrap keeps every shard length 1.
    tiny = [ShardedSampler(3, world_size=8, rank=r, shuffle=False,
                           drop_last=False).indices_for_epoch(0)
            for r in range(8)]
    assert {len(s) for s in tiny} == {1}
    flat = np.concatenate(tiny)
    assert sorted(flat[flat >= 0].tolist()) == [0, 1, 2]
    assert sorted((-(flat[flat < 0] + 1)).tolist()) == [0, 0, 1, 1, 2]


def test_loader_drop_last_false_yields_valid_mask():
    """drop_last=False batches carry a per-sample valid mask; duplicated
    shard-padding samples decode normally but read invalid, and
    pad_batch_to_shards folds the mask into its batch-padding mask."""
    from dualsuperreslearningforsemseg_tpu.parallel import pad_batch_to_shards

    ds = SyntheticDataset(num_images=5, size_hw=(16, 32))
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                    num_workers=2, world_size=2, rank=0)
    batches = list(iter(loader))
    assert len(batches) == 1 == len(loader)  # ceil((5+1)/2 / 4) = 1
    imgs, segs, valid = batches[0]
    assert imgs.shape == (3, 16, 32, 3) and segs.shape == (3, 16, 32)
    # rank 0 gets positions 0, 2, 4 of the padded order [0..4, dup(0)]
    np.testing.assert_array_equal(valid, [1.0, 1.0, 1.0])

    loader1 = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                     num_workers=2, world_size=2, rank=1)
    imgs, segs, valid = next(iter(loader1))
    # rank 1 gets positions 1, 3, 5 -> the last is the cyclic duplicate
    np.testing.assert_array_equal(valid, [1.0, 1.0, 0.0])
    np.testing.assert_array_equal(imgs[2], ds[0][0])  # decoded duplicate of 0

    padded_i, padded_s, mask = pad_batch_to_shards(imgs, segs, 4, valid)
    assert padded_i.shape[0] == 4
    np.testing.assert_array_equal(mask, [1.0, 1.0, 0.0, 0.0])


def test_raw_pair_cache_roundtrip_and_invalidation(tmp_path):
    import os
    import time
    from dualsuperreslearningforsemseg_tpu.data import RawPairCache

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 16, 3), np.uint8)
    seg = rng.integers(0, 34, (8, 16), np.uint8)
    ip, sp = str(tmp_path / 'a.png'), str(tmp_path / 'b.png')
    for p in (ip, sp):
        with open(p, 'wb') as f:
            f.write(b'x' * 10)
    cache = RawPairCache(str(tmp_path / 'cache'), (8, 16))
    assert cache.load(ip, sp) is None
    cache.store(ip, sp, img, seg)
    got = cache.load(ip, sp)
    assert got is not None
    np.testing.assert_array_equal(got[0], img)
    np.testing.assert_array_equal(got[1], seg)
    # touching a source file must invalidate (stat identity in the key)
    time.sleep(0.01)
    with open(ip, 'wb') as f:
        f.write(b'y' * 11)
    assert cache.load(ip, sp) is None
    # a corrupt entry is a miss and gets removed
    cache.store(ip, sp, img, seg)
    entry = cache._entry_path(ip, sp)
    with open(entry, 'wb') as f:
        f.write(b'garbage')
    assert cache.load(ip, sp) is None
    assert not os.path.exists(entry)
    # foreign geometry is silently not stored
    cache.store(ip, sp, img[:4], seg[:4])
    assert cache.load(ip, sp) is None


def test_loader_raw_cache_equivalence(tmp_path):
    """Batches served from the raw cache are identical to decoded ones,
    and the second epoch is all hits."""
    from dualsuperreslearningforsemseg_tpu.data import RawPairCache

    make_synthetic_cityscapes_tree(str(tmp_path), split='train', num_images=4,
                                   size_hw=(16, 32))
    ds = CityscapesDataset(str(tmp_path), split='train')
    plain = Loader(ds, batch_size=2, shuffle=True, seed=7, drop_last=True,
                   num_workers=1)
    cache = RawPairCache(str(tmp_path / 'rawcache'), (16, 32))
    cached = Loader(ds, batch_size=2, shuffle=True, seed=7, drop_last=True,
                    num_workers=1, raw_cache=cache)
    for epoch in (0, 1):
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        for (pi, ps), (ci, cs_) in zip(iter(plain), iter(cached)):
            np.testing.assert_array_equal(pi, ci)
            np.testing.assert_array_equal(ps, cs_)
    # every pair is now cached
    for ip, sp in ds.pairs:
        assert cache.load(ip, sp) is not None


def test_loader_prime_raw_cache(tmp_path):
    """Priming decodes every uncached pair of the rank's shard up front
    (synchronously here), a second prime is a no-op, and primed entries
    serve batches identical to fresh decodes."""
    from dualsuperreslearningforsemseg_tpu.data import RawPairCache

    make_synthetic_cityscapes_tree(str(tmp_path), split='train', num_images=6,
                                   size_hw=(16, 32))
    ds = CityscapesDataset(str(tmp_path), split='train')
    cache = RawPairCache(str(tmp_path / 'rawcache'), (16, 32))
    loader = Loader(ds, batch_size=2, shuffle=True, seed=7, drop_last=True,
                    num_workers=1, raw_cache=cache)
    # No raw cache configured -> no-op.
    plain = Loader(ds, batch_size=2, shuffle=True, seed=7, drop_last=True,
                   num_workers=1)
    assert plain.prime_raw_cache() is None

    stats = loader.prime_raw_cache(background=False)
    assert stats['primed'] == 6 and stats['skipped'] == 0
    for ip, sp in ds.pairs:
        assert cache.load(ip, sp) is not None
    # Idempotent: everything already cached.
    stats = loader.prime_raw_cache(background=False)
    assert stats['primed'] == 0 and stats['skipped'] == 6

    # Background form joins cleanly and records its stats.
    th = loader.prime_raw_cache()
    th.join(timeout=30)
    assert not th.is_alive()
    assert loader._prime_stats['primed'] == 0

    # Primed entries produce batches identical to plain decodes.
    for (pi, ps), (ci, cs_) in zip(iter(plain), iter(loader)):
        np.testing.assert_array_equal(pi, ci)
        np.testing.assert_array_equal(ps, cs_)

    # A sharded loader primes only its own rank's shard.
    c2 = RawPairCache(str(tmp_path / 'rawcache2'), (16, 32))
    l2 = Loader(ds, batch_size=1, shuffle=False, seed=7, drop_last=True,
                num_workers=1, world_size=2, rank=0, raw_cache=c2)
    stats = l2.prime_raw_cache(background=False)
    assert stats['primed'] == 3
    cached_n = sum(c2.load(ip, sp) is not None for ip, sp in ds.pairs)
    assert cached_n == 3

    # With shuffle, the per-rank SHARD is epoch-keyed (global re-permutation
    # before striding): priming must target the epoch the run reads first.
    c3 = RawPairCache(str(tmp_path / 'rawcache3'), (16, 32))
    l3 = Loader(ds, batch_size=1, shuffle=True, seed=7, drop_last=True,
                num_workers=1, world_size=2, rank=0, raw_cache=c3)
    stats = l3.prime_raw_cache(background=False, epoch=1)
    assert stats['primed'] == 3
    epoch1_shard = {int(i) for i in l3.sampler.indices_for_epoch(1)}
    for i, (ip, sp) in enumerate(ds.pairs):
        assert c3.has(ip, sp) == (i in epoch1_shard)
    # has() agrees with load() (stat-only probe vs full read).
    for ip, sp in ds.pairs:
        assert c3.has(ip, sp) == (c3.load(ip, sp) is not None)


def test_device_post_folded_photometrics(rng):
    """make_device_post_fn's folded chain (per-sample blur taps + one affine
    color transform) must match the literal composition: /255 -> 3-tap
    gaussian blur (or passthrough) -> grayscale (or passthrough) ->
    (x - mean)/std, per sample, for the decisions drawn from the same keys."""
    import jax
    from dualsuperreslearningforsemseg_tpu.data.augment import (
        make_device_post_fn, _gaussian_blur3)

    cfg = AugmentConfig(input_hw=(8, 16), output_hw=(16, 32),
                        blur_p=0.5, grayscale_p=0.5)
    post = make_device_post_fn(cfg)
    imgs = rng.integers(0, 256, size=(8, 16, 32, 3), dtype=np.uint8)
    segs = rng.integers(0, 19, size=(8, 16, 32), dtype=np.uint8)
    key = jax.random.PRNGKey(3)
    (img_lo, img_hi), (seg_hi, seg_lo) = post(jnp.asarray(imgs),
                                              jnp.asarray(segs), key)

    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    keys = jax.random.split(key, imgs.shape[0])
    n_blurred = n_grayed = 0
    for i in range(imgs.shape[0]):
        k_blur_p, k_blur_s, k_gray, _ = jax.random.split(keys[i], 4)
        x = jnp.asarray(imgs[i], jnp.float32) / 255.0
        if bool(jax.random.bernoulli(k_blur_p, cfg.blur_p)):
            sigma = jax.random.uniform(k_blur_s, (), minval=cfg.blur_sigma[0],
                                       maxval=cfg.blur_sigma[1])
            x = _gaussian_blur3(x, sigma)
            n_blurred += 1
        else:
            # burn the sigma draw like the fused path does
            jax.random.uniform(k_blur_s, ())
        if bool(jax.random.bernoulli(k_gray, cfg.grayscale_p)):
            g = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
            x = jnp.broadcast_to(g[..., None], x.shape)
            n_grayed += 1
        expected = (np.asarray(x) - mean) / std
        np.testing.assert_allclose(np.asarray(img_hi[i]), expected,
                                   rtol=2e-5, atol=2e-5)
    # the key makes both branches of both decisions occur across 8 samples
    assert 0 < n_blurred < 8 and 0 < n_grayed < 8, (n_blurred, n_grayed)


def test_device_post_unshuffled_hi(rng):
    """unshuffle_hi=2 must emit img_hi exactly pixel_unshuffle(full-res)."""
    import jax
    from dualsuperreslearningforsemseg_tpu.data.augment import make_device_post_fn
    from dualsuperreslearningforsemseg_tpu.ops.conv import pixel_unshuffle

    cfg = AugmentConfig(input_hw=(8, 16), output_hw=(16, 32),
                        blur_p=0.5, grayscale_p=0.5)
    imgs = rng.integers(0, 256, size=(4, 16, 32, 3), dtype=np.uint8)
    segs = rng.integers(0, 19, size=(4, 16, 32), dtype=np.uint8)
    key = jax.random.PRNGKey(5)
    (_, hi_full), _ = make_device_post_fn(cfg)(jnp.asarray(imgs),
                                               jnp.asarray(segs), key)
    post_u = make_device_post_fn(cfg, unshuffle_hi=2)
    assert post_u.unshuffled_hi_factor == 2
    (_, hi_unsh), _ = post_u(jnp.asarray(imgs), jnp.asarray(segs), key)
    np.testing.assert_array_equal(np.asarray(hi_unsh),
                                  np.asarray(pixel_unshuffle(hi_full, 2)))
