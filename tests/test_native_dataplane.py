"""Native C++ data plane vs PIL decode parity + throughput sanity."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from dualsuperreslearningforsemseg_tpu.data import (CityscapesDataset,
                                                    make_synthetic_cityscapes_tree,
                                                    Loader)
from dualsuperreslearningforsemseg_tpu.data.native import (native_available,
                                                           decode_pair_batch)
from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native data plane not built")


@pytest.fixture(scope='module')
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('native') / 'data')
    make_synthetic_cityscapes_tree(root, split='train', num_images=6, size_hw=(64, 128))
    return root


def test_native_matches_pil(tree):
    ds = CityscapesDataset(tree, split='train')
    img_paths = [p[0] for p in ds.pairs]
    seg_paths = [p[1] for p in ds.pairs]
    imgs, segs = decode_pair_batch(img_paths, seg_paths, (64, 128), threads=4)
    for i in range(len(ds)):
        pil_img, pil_seg = ds[i]
        np.testing.assert_array_equal(imgs[i], pil_img)
        np.testing.assert_array_equal(segs[i], pil_seg)


def test_native_fused_lut(tree):
    ds = CityscapesDataset(tree, split='train')
    imgs, segs = decode_pair_batch([ds.pairs[0][0]], [ds.pairs[0][1]], (64, 128),
                                   lut=cs.LABEL_MAPPING_LUT)
    _, raw_seg = ds[0]
    np.testing.assert_array_equal(segs[0], cs.LABEL_MAPPING_LUT[raw_seg])


def test_loader_uses_native(tree):
    ds = CityscapesDataset(tree, split='train')
    loader = Loader(ds, batch_size=3, shuffle=False, drop_last=True, num_workers=2)
    assert loader._native_hw == (64, 128)
    imgs, segs = next(iter(loader))
    assert imgs.shape == (3, 64, 128, 3)
    ref_img, ref_seg = ds[0]
    np.testing.assert_array_equal(imgs[0], ref_img)
    np.testing.assert_array_equal(segs[0], ref_seg)


def test_native_error_on_missing_file(tree):
    with pytest.raises(RuntimeError):
        decode_pair_batch(['/nonexistent.png'], ['/nonexistent2.png'], (64, 128))


def test_native_error_on_wrong_size(tree):
    ds = CityscapesDataset(tree, split='train')
    with pytest.raises(RuntimeError):
        decode_pair_batch([ds.pairs[0][0]], [ds.pairs[0][1]], (32, 32))


def test_native_warp_identity(tree):
    """Identity matrix -> exact passthrough (bilinear at integer coords)."""
    from dualsuperreslearningforsemseg_tpu.data.native import warp_pair_batch
    ds = CityscapesDataset(tree, split='train')
    img, seg = ds[0]
    ident = np.array([[[1, 0, 0], [0, 1, 0]]], np.float32)
    iw, sw = warp_pair_batch(img[None], seg[None], ident, (64, 128))
    np.testing.assert_array_equal(iw[0], img)
    np.testing.assert_array_equal(sw[0], seg)


def test_native_warp_matches_device_warp(tree):
    """Host C++ warp vs the jitted device warp on a random affine: labels must
    agree except at bilinear-boundary ties; images within rounding."""
    import jax
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.data.native import warp_pair_batch
    from dualsuperreslearningforsemseg_tpu.data.augment import (_warp_bilinear,
                                                                _warp_nearest)
    ds = CityscapesDataset(tree, split='train')
    img, seg = ds[0]
    # NB: tie-free coefficients — exact .5 source coords round differently
    # (C++ half-up vs jnp banker's rounding), which is fine for random
    # augmentation but would fail an equality test.
    mat = np.array([[0.913, 0.047, 3.171], [-0.0413, 1.0931, -2.137]], np.float32)
    iw, sw = warp_pair_batch(img[None], seg[None], mat[None], (64, 128))

    dimg = np.asarray(_warp_bilinear(jnp.asarray(img, jnp.float32) / 255.0,
                                     jnp.asarray(mat), (64, 128), 0.0)) * 255.0
    dseg = np.asarray(_warp_nearest(jnp.asarray(seg), jnp.asarray(mat), (64, 128), 255))
    img_diff = np.abs(iw[0].astype(np.float32) - dimg)
    assert np.percentile(img_diff, 99) <= 1.0, img_diff.max()
    seg_agree = (sw[0] == dseg).mean()
    assert seg_agree > 0.99, seg_agree


def test_host_warp_transform_deterministic(tree):
    from dualsuperreslearningforsemseg_tpu.data import (make_host_warp_transform,
                                                        AugmentConfig)
    ds = CityscapesDataset(tree, split='train')
    img, seg = ds[0]
    cfg = AugmentConfig(input_hw=(32, 64), output_hw=(64, 128))
    tf = make_host_warp_transform(cfg, cs.LABEL_MAPPING_LUT, seed=1)
    a = tf(3, 0, img[None], seg[None])
    b = tf(3, 0, img[None], seg[None])
    c = tf(4, 0, img[None], seg[None])
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])
    # label LUT applied: values in train-id space
    assert set(np.unique(a[1]).tolist()) <= set(range(19)) | {255}


def test_native_labels_g16_t_matches_jnp(rng):
    """The C++ g16-major label layout == the jnp reference helper."""
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.data.native import (native_available,
                                                               labels_g16_t)
    from dualsuperreslearningforsemseg_tpu.ops.conv import group_labels_g16_t
    if not native_available():
        import pytest
        pytest.skip("native data plane unavailable")
    seg = rng.integers(0, 256, (3, 32, 64)).astype(np.uint8)
    got = labels_g16_t(seg)
    want = np.asarray(group_labels_g16_t(jnp.asarray(seg)))
    np.testing.assert_array_equal(got, want)


def test_host_warp_transform_emits_position_labels(tree):
    """emit_position_labels: the 3rd element is the layout of the 2nd."""
    import jax.numpy as jnp
    from dualsuperreslearningforsemseg_tpu.data import (make_host_warp_transform,
                                                        AugmentConfig)
    from dualsuperreslearningforsemseg_tpu.data.native import native_available
    from dualsuperreslearningforsemseg_tpu.ops.conv import group_labels_g16_t
    if not native_available():
        import pytest
        pytest.skip("native data plane unavailable")
    ds = CityscapesDataset(tree, split='train')
    img, seg = ds[0]
    cfg = AugmentConfig(input_hw=(32, 64), output_hw=(64, 128))
    tf = make_host_warp_transform(cfg, cs.LABEL_MAPPING_LUT, seed=1,
                                  emit_position_labels=True)
    imgs_w, segs_w, labs = tf(0, 0, img[None], seg[None])
    np.testing.assert_array_equal(
        labs, np.asarray(group_labels_g16_t(jnp.asarray(segs_w))))

def test_stale_abi_rejected(tmp_path):
    """A .so reporting an old dp_version must not load (ADVICE r2: a stale
    library would advertise native_available() without the full symbol set and
    kill the decode threads mid-train)."""
    import subprocess
    from dualsuperreslearningforsemseg_tpu.data import native as native_mod
    src = tmp_path / 'stale.cpp'
    src.write_text('extern "C" int dp_version() { return 1; }\n')
    so = tmp_path / 'stale.so'
    subprocess.run(['g++', '-shared', '-fPIC', str(src), '-o', str(so)],
                   check=True)
    orig = native_mod._SO_PATH
    try:
        native_mod._SO_PATH = str(so)
        assert native_mod._load_and_check() is None
    finally:
        native_mod._SO_PATH = orig


def test_stale_core_abi_degrades_not_drops(tmp_path, monkeypatch, capsys):
    """A stale .so whose CORE ABI is intact (v>=2, decode+warp symbols) must
    keep serving the data plane when a rebuild is impossible — only the
    optional v4 label plane gates off (has_g16_labels() False).  Losing the
    whole warp path to a version bump would cost ~320 ms/step on TPU."""
    import subprocess
    from dualsuperreslearningforsemseg_tpu.data import native as native_mod
    src = tmp_path / 'stale_core.cpp'
    src.write_text(
        'extern "C" int dp_version() { return 3; }\n'
        'extern "C" int dp_decode_png() { return -1; }\n'
        'extern "C" int dp_decode_pair_batch() { return -1; }\n'
        'extern "C" int dp_warp_pair_batch() { return -1; }\n')
    so = tmp_path / 'stale_core.so'
    subprocess.run(['g++', '-shared', '-fPIC', str(src), '-o', str(so)],
                   check=True)
    monkeypatch.setattr(native_mod, '_SO_PATH', str(so))
    monkeypatch.setattr(native_mod, '_try_build', lambda force=False: False)
    monkeypatch.setattr(native_mod, '_lib', None)
    monkeypatch.setattr(native_mod, '_warned', False)
    try:
        assert native_mod.native_available()
        assert not native_mod.has_g16_labels()
        assert 'stale' in capsys.readouterr().out
    finally:
        lib = native_mod._lib
        native_mod._lib = None
        if lib not in (None, False):
            native_mod._dlclose(lib)


def test_noop_make_forces_rebuild(tmp_path, monkeypatch, capsys):
    """A stale .so with an mtime NEWER than dataplane.cpp makes the plain
    `make` a successful no-op; get_lib must not silently adopt the stale
    library then — it retries with an unconditional remake (make -B) and
    picks up the current ABI."""
    import subprocess
    from dualsuperreslearningforsemseg_tpu.data import native as native_mod
    stale_src = tmp_path / 'stale_core.cpp'
    stale_src.write_text(
        'extern "C" int dp_version() { return 3; }\n'
        'extern "C" int dp_decode_png() { return -1; }\n'
        'extern "C" int dp_decode_pair_batch() { return -1; }\n'
        'extern "C" int dp_warp_pair_batch() { return -1; }\n')
    current_src = tmp_path / 'current.cpp'
    current_src.write_text(
        'extern "C" int dp_version() {{ return {}; }}\n'
        'extern "C" int dp_decode_png() {{ return -1; }}\n'
        'extern "C" int dp_decode_pair_batch() {{ return -1; }}\n'
        'extern "C" int dp_warp_pair_batch() {{ return -1; }}\n'
        'extern "C" int dp_labels_g16_t() {{ return -1; }}\n'
        .format(native_mod._EXPECTED_VERSION))
    so = tmp_path / 'plane.so'
    subprocess.run(['g++', '-shared', '-fPIC', str(stale_src), '-o', str(so)],
                   check=True)

    calls = []

    def fake_build(force=False):
        calls.append(force)
        if force:  # the -B remake actually rebuilds
            subprocess.run(['g++', '-shared', '-fPIC', str(current_src),
                            '-o', str(so)], check=True)
        return True  # plain make exits 0 either way (no-op)

    monkeypatch.setattr(native_mod, '_SO_PATH', str(so))
    monkeypatch.setattr(native_mod, '_try_build', fake_build)
    monkeypatch.setattr(native_mod, '_lib', None)
    monkeypatch.setattr(native_mod, '_warned', False)
    try:
        assert native_mod.native_available()
        assert native_mod.has_g16_labels()
        assert calls == [False, True]
        assert 'stale' not in capsys.readouterr().out
    finally:
        lib = native_mod._lib
        native_mod._lib = None
        if lib not in (None, False):
            native_mod._dlclose(lib)


def test_loader_surfaces_producer_errors(tree):
    """A failing host_transform must raise in the consumer, not hang."""
    ds = CityscapesDataset(tree, split='train')

    def boom(epoch, batch_number, imgs, segs):
        raise RuntimeError("host transform failed")

    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2,
                    host_transform=boom)
    with pytest.raises(RuntimeError, match="host transform failed"):
        for _ in loader:
            pass


def test_decode_rejects_crafted_huge_dims(tmp_path):
    """A PNG whose IHDR claims absurd dimensions must come back as an error
    code, not a crash: unbounded IHDR dims could wrap the fast path's
    rowbytes*height size check or throw bad_alloc across the extern "C"
    boundary (native/dataplane.cpp)."""
    import struct
    import zlib
    from dualsuperreslearningforsemseg_tpu.data.native import (native_available,
                                                               get_lib)
    if not native_available():
        import pytest
        pytest.skip("native data plane unavailable")

    def chunk(typ, data):
        raw = typ + data
        return struct.pack('>I', len(data)) + raw + struct.pack(
            '>I', zlib.crc32(raw) & 0xFFFFFFFF)

    # width = 0xFFFFFFF0, height chosen huge: a correct implementation
    # rejects at the header, never allocating or writing.
    ihdr = struct.pack('>IIBBBBB', 0xFFFFFFF0, 0x10000000, 8, 2, 0, 0, 0)
    png = (b'\x89PNG\r\n\x1a\n' + chunk(b'IHDR', ihdr)
           + chunk(b'IDAT', zlib.compress(b'\x00' * 16))
           + chunk(b'IEND', b''))
    p = tmp_path / 'huge.png'
    p.write_bytes(png)

    import ctypes
    lib = get_lib()
    out = np.zeros(1024 * 1024 * 3, np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    c = ctypes.c_int(0)
    err = lib.dp_decode_png(str(p).encode(), out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)), out.size, ctypes.byref(h),
        ctypes.byref(w), ctypes.byref(c), 3)
    assert err != 0, "crafted huge-dims PNG must be rejected with an error"


def test_decode_error_names_failing_pair(tree, tmp_path):
    """v5 batch decode reports WHICH pair failed and a code name — a corrupt
    file in a 3000-image epoch must be localizable from the error alone."""
    ds = CityscapesDataset(tree, split='train')
    bad = str(tmp_path / 'corrupt.png')
    with open(bad, 'wb') as fh:
        fh.write(b'\x89PNG\r\n\x1a\nnot really a png at all')
    img_paths = [ds.pairs[0][0], bad]
    seg_paths = [ds.pairs[0][1], ds.pairs[1][1]]
    with pytest.raises(RuntimeError) as ei:
        decode_pair_batch(img_paths, seg_paths, (64, 128))
    assert 'corrupt.png' in str(ei.value), ei.value
    # dimension mismatch carries its own code name (a too-SMALL buffer is
    # caught earlier as an output-buffer overflow; a larger one decodes,
    # then fails the size contract)
    with pytest.raises(RuntimeError, match='unexpected dimensions'):
        decode_pair_batch([ds.pairs[0][0]], [ds.pairs[0][1]], (128, 256))
    with pytest.raises(RuntimeError, match='output buffer overflow'):
        decode_pair_batch([ds.pairs[0][0]], [ds.pairs[0][1]], (32, 32))


def test_warp_rejects_mismatched_image_batch(tree):
    """The warp derives every stride from the LABEL geometry; an image batch
    of a different resolution must be rejected, not read out of bounds."""
    from dualsuperreslearningforsemseg_tpu.data.native import warp_pair_batch
    imgs = np.zeros((2, 32, 64, 3), np.uint8)
    segs = np.zeros((2, 64, 128), np.uint8)
    mats = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    with pytest.raises(AssertionError):
        warp_pair_batch(imgs, segs, mats, (64, 128))


def test_loader_pil_fallback_warns_once(tree, tmp_path, capsys):
    """One undecodable file must not kill training NOR silently demote the
    loader: the batch retries through PIL (raising its own error if the file
    is truly unreadable) and a CAUTION names the native failure."""
    import shutil
    root = str(tmp_path / 'data')
    shutil.copytree(tree, root)
    ds = CityscapesDataset(root, split='train')
    # Corrupt one image file IN the tree (not pairs[0]: the Loader probes
    # that one for geometry at construction): native decode fails, PIL
    # fails too -> the consumer sees an exception, plus the one-time CAUTION.
    with open(ds.pairs[1][0], 'wb') as fh:
        fh.write(b'\x89PNG\r\n\x1a\ngarbage')
    loader = Loader(ds, batch_size=len(ds), shuffle=False, num_workers=1)
    with pytest.raises(Exception):
        for _ in loader:
            pass
    assert 'native batch decode failed' in capsys.readouterr().out


def test_loader_iterator_pins_epoch_at_iter_time(tree):
    """set_epoch after iter() must not desynchronize the in-flight epoch:
    sampling order AND augmentation RNG both belong to the epoch captured
    when the iterator was created."""
    ds = CityscapesDataset(tree, split='train')
    loader = Loader(ds, batch_size=2, shuffle=True, seed=99, num_workers=1)
    loader.set_epoch(0)
    expected = loader.sampler.indices_for_epoch(0)[:2]
    want_imgs = np.stack([ds[int(i)][0] for i in expected])
    it = iter(loader)           # generator: producer starts at first next()
    loader.set_epoch(3)         # racing epoch bump must not leak in
    imgs, segs = next(it)
    np.testing.assert_array_equal(imgs, want_imgs)
    it.close()


def test_host_warp_transform_rank_independent_draws(tree):
    """Multi-process: each rank must draw DIFFERENT warp matrices at the same
    (epoch, batch_index) — identical draws would shrink the global batch's
    augmentation diversity by world_size.  rank 0 keeps the historical
    [seed, epoch, batch] stream (single-process draws unchanged)."""
    from dualsuperreslearningforsemseg_tpu.data import (make_host_warp_transform,
                                                        AugmentConfig)
    ds = CityscapesDataset(tree, split='train')
    img, seg = ds[0]
    cfg = AugmentConfig(input_hw=(32, 64), output_hw=(64, 128))
    tf0 = make_host_warp_transform(cfg, cs.LABEL_MAPPING_LUT, seed=1)
    tf0r = make_host_warp_transform(cfg, cs.LABEL_MAPPING_LUT, seed=1, rank=0)
    tf1 = make_host_warp_transform(cfg, cs.LABEL_MAPPING_LUT, seed=1, rank=1)
    a = tf0(3, 0, img[None], seg[None])
    a0 = tf0r(3, 0, img[None], seg[None])
    b = tf1(3, 0, img[None], seg[None])
    np.testing.assert_array_equal(a[0], a0[0])   # default == rank 0
    assert not np.array_equal(a[0], b[0])        # rank 1 diverges
