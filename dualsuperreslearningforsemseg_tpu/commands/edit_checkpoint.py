"""`edit-checkpoint` command (/root/reference/command_handlers/
edit_checkpoint.py:8-11): set checkpoint[key] = typeof(value) and re-save."""

import os.path
from pydoc import locate as str2type

from ..checkpoint import load_checkpoint_or_weights, save_checkpoint


def edit_checkpoint(checkpoint, key, value, typeof, **other_args):
    checkpoint_dict = load_checkpoint_or_weights(checkpoint)
    checkpoint_dict[key] = str2type(typeof)(value)
    save_checkpoint(*os.path.split(checkpoint), **checkpoint_dict)
