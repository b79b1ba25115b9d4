from .resize import (resize_bilinear_align_corners, resize_nearest, avg_pool_nhwc,
                     global_avg_pool_nhwc)
from .conv import conv_transpose_2x2_stride2, pixel_shuffle
from .colorize import make_input_output_visualization, colorize_class_map

__all__ = [
    'resize_bilinear_align_corners', 'resize_nearest', 'avg_pool_nhwc',
    'global_avg_pool_nhwc', 'conv_transpose_2x2_stride2', 'pixel_shuffle',
    'make_input_output_visualization', 'colorize_class_map',
]
