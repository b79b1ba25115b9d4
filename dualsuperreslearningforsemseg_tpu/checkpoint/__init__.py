from .io import (load_checkpoint_or_weights, save_checkpoint, save_weights)
from .torch_pth import load_torch_pth, save_torch_pth

__all__ = ['load_checkpoint_or_weights', 'save_checkpoint', 'save_weights',
           'load_torch_pth', 'save_torch_pth']
