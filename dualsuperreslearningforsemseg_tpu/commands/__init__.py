"""One handler per CLI subcommand (reference: command_handlers/).

``main.py`` dispatches with ``getattr(commands, <subcommand>)`` after
normalizing dashes, so every handler must be re-exported here under its
canonical name.  Listed alphabetically; the set of names is the public
CLI surface and must stay in sync with the parser in ``main.py``.
"""

from .benchmark import benchmark
from .compile_model import compile_model
from .edit_checkpoint import edit_checkpoint
from .inspect_checkpoint import inspect_checkpoint
from .print_model import print_model
from .prune_weights import prune_weights
from .test import test
from .train_or_resume import train_or_resume

__all__ = sorted(('benchmark', 'compile_model', 'edit_checkpoint',
                  'inspect_checkpoint', 'print_model', 'prune_weights',
                  'test', 'train_or_resume'))
