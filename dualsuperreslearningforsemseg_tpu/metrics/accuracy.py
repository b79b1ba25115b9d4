"""Masked pixel accuracy (/root/reference/metrices/Accuracy.py:4-30):
per-batch correct/valid ratio, final mean x100."""

import numpy as np


class Accuracy:
    def __init__(self):
        self.reset()

    def reset(self):
        self.dirty = False
        self.mean_accuracy = 0.0
        self.accuracies = []

    def update(self, pred, target, valid_labels_mask):
        assert pred.shape == target.shape, \
            "shape mismatch: pred {} vs target {}".format(pred.shape, target.shape)
        assert len(pred.shape) == 3, \
            "expected rank-3 (B, H, W) class maps, got rank {}".format(len(pred.shape))
        pixels_correct = ((pred == target) * valid_labels_mask).sum()
        total_pixels = valid_labels_mask.sum()
        self.update_from_counts(pixels_correct, total_pixels)

    def update_from_counts(self, pixels_correct, total_pixels):
        self.dirty = True
        pixels_correct = float(pixels_correct)
        total_pixels = float(total_pixels)
        assert pixels_correct <= total_pixels, \
            "invariant violated: more correct pixels than valid pixels"
        if total_pixels == 0:
            # A batch with zero valid pixels: the reference's numpy division
            # yields nan and the mean propagates it (Accuracy.py:25-29);
            # python floats would raise ZeroDivisionError instead.
            self.accuracies.append(float('nan'))
        else:
            self.accuracies.append(pixels_correct / total_pixels)

    def __call__(self):
        if self.dirty:
            self.dirty = False
            self.mean_accuracy = float(np.mean(self.accuracies) * 100.)
        return self.mean_accuracy
