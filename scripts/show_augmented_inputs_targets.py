"""Interactive augmentation viewer (parity: /root/reference/scripts/
show_augmented_inputs_targets.py:17-67) — renders augmented (input, target)
pairs through the device-side augmentation pipeline."""

import argparse
import os

import numpy as np
import jax
from PIL import Image

from dualsuperreslearningforsemseg_tpu import settings
from dualsuperreslearningforsemseg_tpu.data import make_train_augment_fn, AugmentConfig
from dualsuperreslearningforsemseg_tpu.ops.colorize import make_input_output_visualization
from dualsuperreslearningforsemseg_tpu.utils import INFO, ValidateDatasetNameAndSplit


def show_augmented_inputs_targets(args):
    parser = argparse.ArgumentParser(
        description="Show augmented inputs fed to model and target outputs during training.")
    parser.add_argument('--dataset', required=True, nargs=2, metavar=('DATASET', 'SPLIT'),
                        action=ValidateDatasetNameAndSplit, const=settings.DATASETS,
                        help="Dataset and split to operate on")
    parser.add_argument('--shuffle', action='store_true')
    parser.add_argument('--output-dir', type=str, default=settings.OUTPUTS_DIR,
                        help="Where to save visualizations (also shown if a display exists)")
    parser.add_argument('--limit', type=int, default=0, help="Stop after N samples (0 = all)")
    args = parser.parse_args(args)

    entry = settings.DATASETS[args.dataset[0]]
    ds_settings = entry['settings']
    dataset = entry['class'](entry['path'], split=args.dataset[1])

    cfg = AugmentConfig(input_hw=settings.MODEL_INPUT_SIZE,
                        output_hw=settings.MODEL_OUTPUT_SIZE,
                        mean=ds_settings.MEAN, std=ds_settings.STD)
    augment = make_train_augment_fn(cfg, ds_settings.LABEL_MAPPING_LUT)

    order = np.random.permutation(len(dataset)) if args.shuffle else np.arange(len(dataset))
    print(INFO("Press ENTER to show next pair of input and output. Use CTRL+c to quit."))
    key = jax.random.PRNGKey(0)
    try:
        for n, i in enumerate(order):
            if args.limit and n >= args.limit:
                break
            img_u8, seg_u8 = dataset[int(i)]
            key, sub = jax.random.split(key)
            (_, img_hi), (seg_hi, _) = augment(np.asarray(img_u8)[None], np.asarray(seg_u8)[None], sub)
            img = np.asarray(img_hi[0]) * np.asarray(ds_settings.STD) + np.asarray(ds_settings.MEAN)
            img = np.clip(img * 255.0, 0, 255).astype(np.uint8).transpose(2, 0, 1)
            target = np.asarray(seg_hi[0])
            vis = make_input_output_visualization(img, target, ds_settings.CLASS_RGB_COLOR)
            os.makedirs(args.output_dir, exist_ok=True)
            out = os.path.join(args.output_dir, 'augmented_{:d}.png'.format(int(i)))
            with Image.fromarray(vis.transpose(1, 2, 0), mode='RGB') as im:
                im.save(out)
                if os.isatty(0):
                    im.show(title=str(i))
            print(INFO("Saved {:s}".format(out)))
            if os.isatty(0):
                input()
    except KeyboardInterrupt:
        pass
