from .miou import mIoU
from .accuracy import Accuracy
from .average_meter import AverageMeter
from .device import batch_histograms, batch_accuracy_counts

__all__ = ['mIoU', 'Accuracy', 'AverageMeter', 'batch_histograms', 'batch_accuracy_counts']
