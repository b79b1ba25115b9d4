"""Cityscapes on-disk reader.

Replaces the reference's ``torchvision.datasets.Cityscapes`` dependency
(/root/reference/settings.py:69-71) with a direct reader of the standard
layout::

    <root>/leftImg8bit/<split>/<city>/<base>_leftImg8bit.png
    <root>/gtFine/<split>/<city>/<base>_gtFine_labelIds.png

``__getitem__`` returns raw ``(image_u8 HWC, labelIds_u8 HW)`` numpy arrays —
all augmentation happens on device (data/augment.py), unlike the reference's
PIL-transform worker processes.  An optional ``transforms`` callable is
honored for API parity with the reference's joint-transform path.
"""

import os
import os.path

import numpy as np
from PIL import Image


class CityscapesDataset:
    def __init__(self, root, split='train', transforms=None):
        self.root = root
        self.split = split
        self.transforms = transforms
        img_dir = os.path.join(root, 'leftImg8bit', split)
        seg_dir = os.path.join(root, 'gtFine', split)
        self.pairs = []
        if os.path.isdir(img_dir):
            for city in sorted(os.listdir(img_dir)):
                city_dir = os.path.join(img_dir, city)
                if not os.path.isdir(city_dir):
                    continue
                for fname in sorted(os.listdir(city_dir)):
                    if not fname.endswith('_leftImg8bit.png'):
                        continue
                    base = fname[:-len('_leftImg8bit.png')]
                    seg_path = os.path.join(seg_dir, city, base + '_gtFine_labelIds.png')
                    if os.path.isfile(seg_path):
                        self.pairs.append((os.path.join(city_dir, fname), seg_path))

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index):
        img_path, seg_path = self.pairs[index]
        with Image.open(img_path) as im:
            img = np.asarray(im.convert('RGB'), dtype=np.uint8)
        with Image.open(seg_path) as sm:
            seg = np.asarray(sm, dtype=np.uint8)
        if self.transforms is not None:
            return self.transforms(img, seg)
        return img, seg
