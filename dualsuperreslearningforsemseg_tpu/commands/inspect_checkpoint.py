"""`inspect-checkpoint` command: print a checkpoint's hyperparameters and
bookkeeping while eliding bulky arrays (reference behavior:
/root/reference/command_handlers/inspect_checkpoint.py:6-24 — tensors appear
as bare key names, strings quoted, nested dicts rendered inline)."""

import numpy as np

from ..checkpoint import load_checkpoint_or_weights


def _render(value):
    """One checkpoint value -> display string, or None to elide (arrays)."""
    if isinstance(value, dict):
        entries = []
        for key, child in value.items():
            rendered = _render(child)
            entries.append(str(key) if rendered is None
                           else '{}: {}'.format(key, rendered))
        return '{{{}}}'.format(', '.join(entries))
    if isinstance(value, (np.ndarray, list)):
        return None
    if isinstance(value, str):
        return '"{}"'.format(value)
    return str(value)


def inspect_checkpoint(checkpoint, **other_args):
    print(_render(load_checkpoint_or_weights(checkpoint)))
