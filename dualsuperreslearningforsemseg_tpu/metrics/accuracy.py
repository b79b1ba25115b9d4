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
            "BUG CHECK: 'pred' and 'target' must be of the same shape of (B, H, W)."
        assert len(pred.shape) == 3, \
            "BUG CHECK: 'target' and 'pred' must be (B, H, W) channel-order dimensions."
        pixels_correct = ((pred == target) * valid_labels_mask).sum()
        total_pixels = valid_labels_mask.sum()
        self.update_from_counts(pixels_correct, total_pixels)

    def update_from_counts(self, pixels_correct, total_pixels):
        self.dirty = True
        pixels_correct = float(pixels_correct)
        total_pixels = float(total_pixels)
        assert pixels_correct <= total_pixels, \
            "BUG CHECK: 'pixels_correct' cannot be be greater than 'total_pixels'."
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
