"""`test` command: single-image / directory / dataset-split inference.

Parity with /root/reference/command_handlers/test.py:17-118 — EXIF transpose,
RGB convert, resize to MODEL_OUTPUT_SIZE for display, normalize + resize to
MODEL_INPUT_SIZE for the network, stage-1 forward, argmax, palette
visualization saved as PNG.  The reference's dataset mode crashes with a
NameError (test.py:96 uses an undefined ``input_image``) — fixed here, not
replicated.  ``--compiled-model`` loads an AOT-serialized function produced
by `compile-model`.
"""

import os
import os.path

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image, ImageOps
from tqdm.auto import tqdm

from .. import consts, settings
from ..checkpoint import load_checkpoint_or_weights
from ..data import make_eval_transform_fn, AugmentConfig
from ..metrics.device import argmax_lastdim
from ..models import DSRL, load_state_dict, init_model_host
from ..ops.colorize import make_input_output_visualization
from ..ops.resize import resize_bilinear_align_corners
from ..utils import INFO, timethis, getFilesWithExtension, swapTupleValues


def _build_forward(weights, dataset, compiled_model):
    """Returns fn(img_lo f32 NHWC normalized) -> SSSR logits."""
    if compiled_model:
        from .compile_model import load_compiled_model
        return load_compiled_model(weights)
    model = DSRL(stage=1, num_classes=dataset['settings'].NUM_CLASSES)
    variables = _init_eval_variables(model)
    state = load_checkpoint_or_weights(weights)
    variables, _, _ = load_state_dict(variables, state['model_state_dict'], strict=False)
    return jax.jit(lambda x: model.apply(variables, x, False)[0])


def _build_pipeline(weights, dataset, compiled_model):
    """Fused single-image pipeline: fn(uint8 image at MODEL_OUTPUT_SIZE) ->
    uint8 class map at MODEL_OUTPUT_SIZE, one XLA program.

    Latency-critical path (the reference's timing site, test.py:51): /255,
    normalize, align-corners resize to MODEL_INPUT_SIZE, forward and argmax
    all run on-device, so the host transfers uint8 both ways (~2.3x less
    tunnel traffic than f32-in/int32-out) and does no per-pixel math.
    `exported.call` is traceable, so the compiled-model path fuses the same
    way around the deserialized StableHLO forward."""
    ds_settings = dataset['settings']
    forward = _build_forward(weights, dataset, compiled_model)
    mean = jnp.asarray(ds_settings.MEAN, jnp.float32)
    std = jnp.asarray(ds_settings.STD, jnp.float32)

    @jax.jit
    def pipeline(img_u8):
        x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
        img_lo = resize_bilinear_align_corners(x[None], settings.MODEL_INPUT_SIZE)
        sssr = forward(img_lo)
        return argmax_lastdim(sssr[0]).astype(jnp.uint8)

    return pipeline


def _init_eval_variables(model):
    return init_model_host(model, settings.MODEL_INPUT_SIZE)


def test(image_file, images_dir, dataset, output_dir, weights, device,
         compiled_model, show=False, no_interactive=False, **other_args):
    """--show opens the visualization in single-image-file and dataset
    modes; --images-dir never displays (the reference shows "only if a
    single image file is specified", test.py:68-70).  Dataset mode pauses
    for ENTER between images unless --no-interactive
    (/root/reference/command_handlers/test.py:63-72,102)."""
    if not dataset:
        # Same FIXME as the reference (test.py:22-24): normalization settings
        # are not stored in weights; default to cityscapes.
        dataset = dict(settings.DATASETS['cityscapes'])

    ds_settings = dataset['settings']
    mean = np.asarray(ds_settings.MEAN, np.float32)
    std = np.asarray(ds_settings.STD, np.float32)

    if image_file or images_dir:
        pipeline = _build_pipeline(weights, dataset, compiled_model)
        image_filenames = [image_file] if image_file else \
            getFilesWithExtension(images_dir, consts.IMAGE_FILE_EXTENSIONS, with_path=True)

        for image_filename in tqdm(image_filenames, desc='TESTING', colour='yellow',
                                   position=0, leave=False):
            # The file handle needs its own `with`: the outer one only
            # manages the .resize() result, and leaked descriptors add up
            # over a large --images-dir sweep.
            with Image.open(image_filename) as src, \
                    ImageOps.exif_transpose(src) \
                    .convert('RGB') \
                    .resize(swapTupleValues(settings.MODEL_OUTPUT_SIZE), resample=Image.BILINEAR) as input_image:
                arr = np.asarray(input_image, dtype=np.uint8)
                with timethis(INFO("Inference required {:}.")):
                    pred = np.asarray(pipeline(jnp.asarray(arr)))

                input_chw = arr.transpose((2, 0, 1))
                vis_image = make_input_output_visualization(input_chw, pred, ds_settings.CLASS_RGB_COLOR)
                vis_image = vis_image.transpose((1, 2, 0))

            with Image.fromarray(vis_image, mode='RGB') as vis:
                os.makedirs(output_dir, exist_ok=True)
                out_name = os.path.join(output_dir,
                                        os.path.splitext(os.path.basename(image_filename))[0] + '.png')
                vis.save(out_name, format='PNG')
                if image_file and show:
                    vis.show(title='Segmentation output')
            print(INFO("Output image saved as: {0:s}.".format(out_name)))
    else:
        forward = _build_forward(weights, dataset, compiled_model)
        aug_cfg = AugmentConfig(input_hw=settings.MODEL_INPUT_SIZE,
                                output_hw=settings.MODEL_OUTPUT_SIZE,
                                mean=ds_settings.MEAN, std=ds_settings.STD)
        eval_fn = make_eval_transform_fn(aug_cfg, ds_settings.LABEL_MAPPING_LUT)
        test_dataset = dataset['class'](dataset['path'], split=dataset.get('split', 'val'))

        print(INFO("Press ENTER to show next pair of input and output. Use CTRL+c to quit."))
        for i in tqdm(range(len(test_dataset)), desc='TESTING', colour='yellow',
                      position=0, leave=False):
            if i < dataset.get('starting_index', 0):
                continue
            img_u8, seg_u8 = test_dataset[i]
            (img_lo, img_hi), (seg_hi, _) = eval_fn(jnp.asarray(img_u8)[None],
                                                    jnp.asarray(seg_u8)[None])
            with timethis(INFO("Inference required {:}.")):
                sssr = forward(img_lo)
                # np.array (copy): np.asarray returns jax's READ-ONLY host
                # view and the ignore-label masking below writes in place.
                pred = np.array(argmax_lastdim(sssr[0]))

            disp = np.asarray(img_hi[0]) * std + mean
            disp = np.clip(disp * 255.0, 0.0, 255.0).astype(np.uint8).transpose((2, 0, 1))
            target = np.asarray(seg_hi[0])
            pred[target == ds_settings.IGNORE_CLASS_LABEL] = ds_settings.IGNORE_CLASS_LABEL
            vis_target = make_input_output_visualization(disp, target, ds_settings.CLASS_RGB_COLOR)
            vis_pred = make_input_output_visualization(disp, pred, ds_settings.CLASS_RGB_COLOR)
            vis = np.concatenate((vis_target, vis_pred), axis=1).transpose((1, 2, 0))

            with Image.fromarray(vis, mode='RGB') as vis_img:
                os.makedirs(output_dir, exist_ok=True)
                out_name = os.path.join(output_dir, str(i) + '.png')
                vis_img.save(out_name, format='PNG')
                if show:
                    vis_img.show(title='Segmentation output')
            print(INFO("Output image saved as: {0:s}.".format(out_name)))
            if not no_interactive and os.isatty(0):
                input()
