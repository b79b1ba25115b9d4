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
