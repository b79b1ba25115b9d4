"""mIoU metric with exact reference semantics
(/root/reference/metrices/mIoU.py:5-41): per-batch nanmean of
intersection/union histograms over the +1-shifted masked labels, final
nanmean over batches x100.

``update`` accepts host numpy (B, H, W) arrays like the reference;
``update_from_areas`` accepts the device-computed histogram triple from
``metrics.device.batch_histograms`` so the eval loop never copies logits to
the host.  Both paths are tested to produce identical results.
"""

import numpy as np


class mIoU:
    def __init__(self, num_classes):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.dirty = False
        self.miou = 0.0
        self.ious = []

    def update(self, pred, target, valid_labels_mask):
        assert pred.shape == target.shape, \
            "shape mismatch: pred {} vs target {}".format(pred.shape, target.shape)
        assert len(pred.shape) == 3, \
            "expected rank-3 (B, H, W) class maps, got rank {}".format(len(pred.shape))

        pred = pred.astype(np.int64) + 1
        target = target.astype(np.int64) + 1
        pred = pred * valid_labels_mask
        inter = pred * (pred == target)

        area_pred, _ = np.histogram(pred, bins=self.num_classes, range=(1, self.num_classes))
        area_inter, _ = np.histogram(inter, bins=self.num_classes, range=(1, self.num_classes))
        area_target, _ = np.histogram(target, bins=self.num_classes, range=(1, self.num_classes))
        self.update_from_areas(area_pred, area_inter, area_target)

    def update_from_areas(self, area_pred, area_inter, area_target):
        self.dirty = True
        area_pred = np.asarray(area_pred, dtype=np.float64)
        area_inter = np.asarray(area_inter, dtype=np.float64)
        area_target = np.asarray(area_target, dtype=np.float64)
        area_union = area_pred + area_target - area_inter
        assert (area_inter <= area_union).all(), \
            "invariant violated: intersection exceeds union"
        with np.errstate(divide='ignore', invalid='ignore'):
            self.ious.append(np.nanmean(area_inter / area_union))

    def __call__(self):
        if self.dirty:
            self.dirty = False
            self.miou = float(np.nanmean(self.ious) * 100.)
        return self.miou
