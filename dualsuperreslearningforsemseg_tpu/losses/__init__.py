from .cross_entropy import cross_entropy_loss
from .mse import mse_loss
from .fa import fa_loss, fa_loss_reference_dense

__all__ = ['cross_entropy_loss', 'mse_loss', 'fa_loss', 'fa_loss_reference_dense']
