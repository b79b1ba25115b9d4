from .train_or_resume import train_or_resume
from .test import test
from .print_model import print_model
from .prune_weights import prune_weights
from .inspect_checkpoint import inspect_checkpoint
from .edit_checkpoint import edit_checkpoint
from .benchmark import benchmark
from .compile_model import compile_model

__all__ = ['train_or_resume', 'test', 'print_model', 'prune_weights',
           'inspect_checkpoint', 'edit_checkpoint', 'benchmark', 'compile_model']
