"""`benchmark` command: full-split eval producing CE / mIoU / Accuracy.

Parity with /root/reference/command_handlers/benchmark.py:16-95 (stage-1
model, val/test transforms, metric accumulation, printed results +
outputs/benchmark.txt) with the TPU eval design: metrics accumulate on
device; only histogram vectors return to host.  Also reports throughput.

The reference averages CE with the *nominal* batch size even for the ragged
final batch (benchmark.py:65) — documented bug, not replicated: we weight by
the actual batch size.
"""

import os
import os.path
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp
from tqdm.auto import tqdm

from .. import settings
from ..checkpoint import load_checkpoint_or_weights
from ..data import Loader, make_eval_transform_fn, AugmentConfig
from ..losses import cross_entropy_loss
from ..metrics import mIoU, Accuracy, AverageMeter
from ..metrics.device import batch_histograms, batch_accuracy_counts, argmax_lastdim
from ..models import DSRL, load_state_dict
from ..utils import INFO, FATAL
from .test import _init_eval_variables


def benchmark(weights, dataset, device, num_workers, batch_size, **other_args):
    process_start_timestamp = datetime.now()
    ds_settings = dataset['settings']

    model = DSRL(stage=1, num_classes=ds_settings.NUM_CLASSES)
    variables = _init_eval_variables(model)
    state = load_checkpoint_or_weights(weights)
    variables, _, _ = load_state_dict(variables, state['model_state_dict'], strict=False)

    os.makedirs(dataset['path'], exist_ok=True)
    test_dataset = dataset['class'](dataset['path'], split=dataset.get('split', 'val'))
    if len(test_dataset) == 0:
        raise Exception(FATAL("Cityscapes dataset was not found under '{:s}'. "
                              "Please refer to 'README.md'.".format(dataset['path'])))

    aug_cfg = AugmentConfig(input_hw=settings.MODEL_INPUT_SIZE,
                            output_hw=settings.MODEL_OUTPUT_SIZE,
                            mean=ds_settings.MEAN, std=ds_settings.STD)
    eval_fn = make_eval_transform_fn(aug_cfg, ds_settings.LABEL_MAPPING_LUT)
    loader = Loader(test_dataset, batch_size=batch_size, shuffle=False,
                    drop_last=False, num_workers=num_workers)

    @jax.jit
    def bench_step(img_lo, seg_hi):
        sssr = model.apply(variables, img_lo, False)[0]
        ce = cross_entropy_loss(sssr, seg_hi, ds_settings.IGNORE_CLASS_LABEL)
        pred = argmax_lastdim(sssr)
        hists = batch_histograms(pred, seg_hi, ds_settings.NUM_CLASSES,
                                 ds_settings.IGNORE_CLASS_LABEL)
        acc = batch_accuracy_counts(pred, seg_hi, ds_settings.IGNORE_CLASS_LABEL)
        return ce, hists, acc

    CE_avg_loss = AverageMeter()
    miou = mIoU(num_classes=ds_settings.NUM_CLASSES)
    accuracy_mean = Accuracy()
    n_images = 0

    with tqdm(total=len(loader), desc='BENCHMARKING', colour='yellow',
              position=0, leave=False, bar_format=settings.PROGRESSBAR_FORMAT) as progressbar:
        for imgs_u8, segs_u8 in loader:
            (img_lo, _), (seg_hi, _) = eval_fn(jnp.asarray(imgs_u8), jnp.asarray(segs_u8))
            ce, hists, acc = bench_step(img_lo, seg_hi)
            CE_avg_loss.update(float(ce), imgs_u8.shape[0])
            miou.update_from_areas(*jax.device_get(hists))
            accuracy_mean.update_from_counts(*[int(v) for v in jax.device_get(acc)])
            n_images += imgs_u8.shape[0]
            progressbar.update()

    elapsed = (datetime.now() - process_start_timestamp).total_seconds()
    print("-------- RESULTS --------")
    print("Avg. Cross Entropy Error: {:.3f}".format(CE_avg_loss()))
    print("mIoU %: {:.2f}".format(miou()))
    print("Mean Accuracy %: {:.2f}".format(accuracy_mean()))
    print("Throughput: {:.2f} images/sec (end-to-end, incl. decode)".format(
        n_images / max(elapsed, 1e-9)))

    os.makedirs(settings.OUTPUTS_DIR, exist_ok=True)
    output_benchmark_filename = os.path.join(settings.OUTPUTS_DIR, 'benchmark.txt')
    with open(output_benchmark_filename, 'w') as benchmark_file:
        benchmark_file.write("Benchmarking results on Cityscapes dataset's {:s} split\n\n".format(
            dataset.get('split', 'val')))
        benchmark_file.write("On: {:s}\n".format(process_start_timestamp.strftime("%c")))
        benchmark_file.write("Weights file: {:s}\n\n".format(weights))
        benchmark_file.write("Avg. Cross Entropy Error: {:.3f}\n".format(CE_avg_loss()))
        benchmark_file.write("mIoU %: {:.2f}\n".format(miou()))
        benchmark_file.write("Mean Accuracy %: {:.2f}\n".format(accuracy_mean()))
    print(INFO("Benchmark results written to '{:s}'.".format(output_benchmark_filename)))
