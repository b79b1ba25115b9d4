"""Cityscapes dataset settings.

Value-for-value parity with /root/reference/datasets/Cityscapes/settings.py:3-28
(these are published dataset constants, not code): 19 evaluation classes, the
34->19 raw-labelId mapping, per-channel normalization statistics and the
cityscapesScripts color palette.  The mapping is additionally materialized as a
256-entry numpy LUT so label translation is a single vectorized gather instead
of the reference's python loop
(/root/reference/models/transforms/JointImageAndLabelTensor.py:13-14).
"""

import numpy as np

from ..consts import NUM_RGB_CHANNELS

NUM_CLASSES = 19
# NOTE: computed by the reference via
# 'python run_script.py calculate_dataset_mean_std --dataset-split train'
MEAN = (0.28690, 0.32513, 0.28389)
STD = (0.17614, 0.18099, 0.17772)

IGNORE_CLASS_LABEL = 255
LABEL_MAPPING_DICT = {
    0: IGNORE_CLASS_LABEL, 1: IGNORE_CLASS_LABEL, 2: IGNORE_CLASS_LABEL, 3: IGNORE_CLASS_LABEL,
    4: IGNORE_CLASS_LABEL, 5: IGNORE_CLASS_LABEL, 6: IGNORE_CLASS_LABEL, 7: 0, 8: 1,
    9: IGNORE_CLASS_LABEL, 10: IGNORE_CLASS_LABEL, 11: 2, 12: 3, 13: 4, 14: IGNORE_CLASS_LABEL,
    15: IGNORE_CLASS_LABEL, 16: IGNORE_CLASS_LABEL, 17: 5, 18: IGNORE_CLASS_LABEL, 19: 6, 20: 7,
    21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 29: IGNORE_CLASS_LABEL,
    30: IGNORE_CLASS_LABEL, 31: 16, 32: 17, 33: 18, -1: IGNORE_CLASS_LABEL
}

# Vectorized label LUT: raw labelId (uint8) -> train class id.  Index 255 maps
# -1 as well (uint8 wraps -1 to 255).  Unlisted raw ids map to IGNORE.
LABEL_MAPPING_LUT = np.full(256, IGNORE_CLASS_LABEL, dtype=np.uint8)
for _raw, _cls in LABEL_MAPPING_DICT.items():
    LABEL_MAPPING_LUT[_raw % 256] = _cls

# Class colors from cityscapesScripts (classes with ignoreInEval == False).
CLASS_RGB_COLOR = {
    0: (128, 64, 128), 1: (244, 35, 232), 2: (70, 70, 70), 3: (102, 102, 156), 4: (190, 153, 153),
    5: (153, 153, 153), 6: (250, 170, 30), 7: (220, 220, 0), 8: (107, 142, 35), 9: (152, 251, 152),
    10: (70, 130, 180), 11: (220, 20, 60), 12: (255, 0, 0), 13: (0, 0, 142), 14: (0, 0, 70), 15: (0, 60, 100),
    16: (0, 80, 100), 17: (0, 0, 230), 18: (119, 11, 32), IGNORE_CLASS_LABEL: (0, 0, 0)
}
assert len(CLASS_RGB_COLOR) == NUM_CLASSES + 1 and all(len(x) == NUM_RGB_CHANNELS for x in CLASS_RGB_COLOR.values()), \
    "'CLASS_RGB_COLOR' needs {:d} color values with three RGB color values!".format(NUM_CLASSES)

# Palette as a dense (256, 3) uint8 array for vectorized colorization: row k is
# the color of class k; unknown/ignore classes are black.
CLASS_RGB_PALETTE = np.zeros((256, NUM_RGB_CHANNELS), dtype=np.uint8)
for _cls, _rgb in CLASS_RGB_COLOR.items():
    CLASS_RGB_PALETTE[_cls] = _rgb
