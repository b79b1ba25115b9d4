"""Synthetic Cityscapes fixtures for tests and ``--dry-run``-style smoke runs
(SURVEY.md §4: the reference has no test fixtures; this is our substitute)."""

import os
import os.path

import numpy as np
from PIL import Image


def make_synthetic_cityscapes_tree(root, split='train', num_images=4,
                                   size_hw=(64, 128), seed=0):
    """Write a miniature Cityscapes-layout tree of random PNGs + label maps."""
    rng = np.random.default_rng(seed)
    h, w = size_hw
    img_dir = os.path.join(root, 'leftImg8bit', split, 'synthcity')
    seg_dir = os.path.join(root, 'gtFine', split, 'synthcity')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(seg_dir, exist_ok=True)
    for i in range(num_images):
        base = 'synthcity_{:06d}_{:06d}'.format(i, i)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        # raw labelIds in 0..33 with some void pixels
        seg = rng.integers(0, 34, size=(h, w), dtype=np.uint8)
        seg[:2, :2] = 0  # unlabeled -> maps to ignore
        Image.fromarray(img).save(os.path.join(img_dir, base + '_leftImg8bit.png'))
        Image.fromarray(seg).save(os.path.join(seg_dir, base + '_gtFine_labelIds.png'))
    return root


class SyntheticDataset:
    """In-memory dataset with the CityscapesDataset interface."""

    def __init__(self, num_images=8, size_hw=(64, 128), seed=0):
        rng = np.random.default_rng(seed)
        h, w = size_hw
        self.images = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                       for _ in range(num_images)]
        self.segs = [rng.integers(0, 34, size=(h, w), dtype=np.uint8)
                     for _ in range(num_images)]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        return self.images[index], self.segs[index]
