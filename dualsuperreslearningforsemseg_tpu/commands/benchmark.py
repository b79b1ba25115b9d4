"""`benchmark` command: full-split eval producing CE / mIoU / Accuracy.

Parity with /root/reference/command_handlers/benchmark.py:16-95 (stage-1
model, val/test transforms, metric accumulation, printed results +
outputs/benchmark.txt) with the TPU eval design: the evaluation is sharded
over the full device mesh (the reference is single-GPU) using the same
pad/mask machinery as the training-loop validator — ragged final batches are
padded to the shard count and masked rows contribute nothing to any loss or
metric, so the sharded result is identical to a single-device pass.  Metrics
accumulate on device; only histogram vectors return to host.

The reference averages CE with the *nominal* batch size even for the ragged
final batch (benchmark.py:65) — documented bug, not replicated: we weight by
the actual batch size.
"""

import os
import os.path
from datetime import datetime

import jax
from tqdm.auto import tqdm

from .. import settings
from ..checkpoint import load_checkpoint_or_weights
from ..data import Loader, DevicePrefetcher, make_eval_transform_fn, AugmentConfig
from ..metrics import mIoU, Accuracy, AverageMeter
from ..models import DSRL, load_state_dict
from ..parallel import (make_mesh, batch_sharding, replicate, is_master_rank,
                        data_shards_per_process,
                        pad_batch_to_shards, count_valid_fn)
from ..train import make_eval_step
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
                    drop_last=False, num_workers=num_workers,
                    world_size=jax.process_count(), rank=jax.process_index(),
                    raw_cache='env')
    # Same warm-read economics as training (DSRL_TPU_RAW_CACHE): prime this
    # rank's shard in the background through the eval-program compile.
    # shuffle=False -> the epoch-0 shard IS the shard every pass reads.
    if os.environ.get('DSRL_TPU_PRIME_RAW_CACHE', '1') != '0':
        loader.prime_raw_cache()

    mesh = make_mesh()
    n_shards = data_shards_per_process(mesh)
    params = replicate(variables['params'], mesh)
    batch_stats = replicate(variables['batch_stats'], mesh)
    eval_step = make_eval_step(model, stage=1, w1=0.0, w2=0.0,
                               num_classes=ds_settings.NUM_CLASSES,
                               ignore_label=ds_settings.IGNORE_CLASS_LABEL,
                               mesh=mesh)
    # Parameters cross the per-batch jit boundary packed (train/packing.py):
    # one buffer instead of ~900 small BN/bias operands per dispatch.
    from ..train.packing import pack_eval_state
    pstate = pack_eval_state(params, batch_stats)
    sharding = batch_sharding(mesh, 4)
    sharding3 = batch_sharding(mesh, 3)
    sharding1 = batch_sharding(mesh, 1)

    CE_avg_loss = AverageMeter()
    miou = mIoU(num_classes=ds_settings.NUM_CLASSES)
    accuracy_mean = Accuracy()
    n_images = 0

    def stage_batch(batch):
        """Runs on the DevicePrefetcher thread: pad/mask + H2D staging
        overlap the device's evaluation of the previous batch (same shape
        as the training-loop validator, train_or_resume.py).  The Loader's
        valid mask (drop_last=False cyclic shard duplicates) folds into the
        batch-padding mask so no sample is double-counted."""
        imgs_u8, segs_u8, valid = batch
        imgs_u8, segs_u8, mask = pad_batch_to_shards(imgs_u8, segs_u8,
                                                     n_shards, valid)
        return (jax.make_array_from_process_local_data(sharding, imgs_u8),
                jax.make_array_from_process_local_data(sharding3, segs_u8),
                jax.make_array_from_process_local_data(sharding1, mask))

    # Per-batch GLOBAL valid-image count as a replicated device scalar: the
    # local count would mis-weight the (global) per-batch CE mean and
    # undercount throughput by ~process_count on multi-process meshes, and
    # the sharded mask itself is not fetchable from one process.
    count_valid = count_valid_fn(mesh)

    # Per-batch results stay ON DEVICE until the loop ends: fetching (or
    # float()-ing) inside the loop would drain the dispatch queue every
    # step.  The pending payload is three 19-vectors + 3 scalars per batch.
    pending = []
    with tqdm(total=len(loader), desc='BENCHMARKING', colour='yellow',
              position=0, leave=False, bar_format=settings.PROGRESSBAR_FORMAT) as progressbar:
        for imgs_dev, segs_dev, mask_dev in DevicePrefetcher(loader, stage_batch):
            (img_lo, img_hi), (seg_hi, _) = eval_fn(imgs_dev, segs_dev)
            losses, _, hists, acc = eval_step.from_state(
                pstate, img_lo, img_hi, seg_hi, mask_dev)
            pending.append((losses['CE'], hists, acc, count_valid(mask_dev)))
            progressbar.update()
    for ce, hists, acc, n_dev in pending:
        n = int(jax.device_get(n_dev))
        n_images += n
        CE_avg_loss.update(float(ce), n)
        miou.update_from_areas(*jax.device_get(hists))
        accuracy_mean.update_from_counts(*[int(v) for v in jax.device_get(acc)])

    elapsed = (datetime.now() - process_start_timestamp).total_seconds()
    print("-------- RESULTS --------")
    print("Avg. Cross Entropy Error: {:.3f}".format(CE_avg_loss()))
    print("mIoU %: {:.2f}".format(miou()))
    print("Mean Accuracy %: {:.2f}".format(accuracy_mean()))
    print("Throughput: {:.2f} images/sec (end-to-end, incl. decode; {:d} device(s))".format(
        n_images / max(elapsed, 1e-9), mesh.devices.size))

    if not is_master_rank():
        return
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
