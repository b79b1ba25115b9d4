"""Streaming weighted mean.

Same contract as the reference meter (/root/reference/metrices/AverageMeter.py):
``update(value, n)`` folds in ``n`` samples whose mean is ``value``; calling
the meter yields the weighted mean of everything since ``reset()``, cached
between updates.  Unlike the reference, an empty meter answers nan instead of
dividing by zero.

Public attributes read elsewhere in the framework: ``val`` (most recent
update value, used for progress-bar postfixes) and ``count``.
"""


class AverageMeter:
    __slots__ = ('val', 'count', '_weighted_total', '_mean', 'dirty')

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.count = 0
        self._weighted_total = 0.0
        # A never-updated meter answers nan (the documented contract), not a
        # legitimate-looking 0.0.
        self._mean = float('nan')
        self.dirty = False

    def update(self, val, n=1):
        self.val = val
        self._weighted_total += val * n
        self.count += n
        self.dirty = True

    def __call__(self):
        if self.dirty:
            self._mean = self._weighted_total / self.count if self.count else float('nan')
            self.dirty = False
        return self._mean
