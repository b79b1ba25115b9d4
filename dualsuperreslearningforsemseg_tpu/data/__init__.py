from .reader import CityscapesDataset
from .synthetic import make_synthetic_cityscapes_tree, SyntheticDataset
from .augment import (make_train_augment_fn, make_eval_transform_fn, AugmentConfig)
from .pipeline import Loader, ShardedSampler

__all__ = ['CityscapesDataset', 'make_synthetic_cityscapes_tree', 'SyntheticDataset',
           'make_train_augment_fn', 'make_eval_transform_fn', 'AugmentConfig',
           'Loader', 'ShardedSampler']
