from .reader import CityscapesDataset
from .synthetic import make_synthetic_cityscapes_tree, SyntheticDataset
from .augment import (make_train_augment_fn, make_eval_transform_fn, AugmentConfig,
                      make_host_warp_transform, make_device_post_fn,
                      sample_affine_matrices_np)
from .pipeline import Loader, ShardedSampler, DevicePrefetcher
from .raw_cache import RawPairCache

__all__ = ['CityscapesDataset', 'make_synthetic_cityscapes_tree', 'SyntheticDataset',
           'make_train_augment_fn', 'make_eval_transform_fn', 'AugmentConfig',
           'make_host_warp_transform', 'make_device_post_fn',
           'sample_affine_matrices_np', 'Loader', 'ShardedSampler',
           'DevicePrefetcher', 'RawPairCache']
