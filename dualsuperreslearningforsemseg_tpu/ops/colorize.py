"""Segmentation-map visualization kernel.

TPU-native replacement for the reference's numba ``@nb.jit(parallel=True)``
colorize/blend kernel (/root/reference/utils.py:284-305): the palette lookup
is a single vectorized gather from a dense (256, 3) palette and the alpha
blend is fused elementwise math — jit-compiled once by XLA, no per-pixel
Python or LLVM loops.  Runs fine on CPU backends too (it is off the training
hot path; it serves `test`/TensorBoard visualization).
"""

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _colorize_and_blend(class_map: jnp.ndarray, palette: jnp.ndarray,
                        input_image: jnp.ndarray, blend_factor: jnp.ndarray):
    colored = jnp.take(palette, class_map.astype(jnp.int32), axis=0)  # (H, W, 3)
    inp = input_image.astype(jnp.float32)
    overlay = jnp.minimum((1.0 - blend_factor) * inp + blend_factor * colored.astype(jnp.float32), 255.0)
    return colored.astype(jnp.uint8), overlay.astype(jnp.uint8)


def _build_palette(class_rgb_color: dict) -> np.ndarray:
    """(256, 3) uint8 lookup: class index (mod 256) -> RGB; unmapped
    classes (incl. the 255 ignore label) stay black."""
    palette = np.zeros((256, 3), dtype=np.uint8)
    for cls, rgb in class_rgb_color.items():
        palette[cls % 256] = rgb
    return palette


def colorize_class_map(class_map: np.ndarray, class_rgb_color: dict) -> np.ndarray:
    """Map an (H, W) class-index array to an (H, W, 3) uint8 color image."""
    palette = _build_palette(class_rgb_color)
    out = np.asarray(jnp.take(jnp.asarray(palette), jnp.asarray(class_map, dtype=jnp.int32) % 256, axis=0))
    return out


def make_input_output_visualization(input_image: np.ndarray, output_map: np.ndarray,
                                    class_rgb_color: dict, blend_factor: float = 0.4) -> np.ndarray:
    """Build the [input | colorized seg | overlay] strip.

    Signature/behavior parity with /root/reference/utils.py:284-305: takes a
    CHW uint8 image and an (H, W) class map, returns a CHW uint8 image of
    width 3*W.
    """
    assert input_image.shape[-2:] == output_map.shape[-2:]
    assert len(input_image.shape) == 3 and len(output_map.shape) == 2
    assert 0.0 < blend_factor < 1.0

    palette = _build_palette(class_rgb_color)

    inp_hwc = np.ascontiguousarray(np.transpose(input_image.astype(np.uint8), (1, 2, 0)))
    colored, overlay = _colorize_and_blend(
        jnp.asarray(output_map.astype(np.int32) % 256),
        jnp.asarray(palette),
        jnp.asarray(inp_hwc),
        jnp.float32(blend_factor))
    strip = np.concatenate((inp_hwc, np.asarray(colored), np.asarray(overlay)), axis=1)
    return np.ascontiguousarray(np.transpose(strip, (2, 0, 1)))
