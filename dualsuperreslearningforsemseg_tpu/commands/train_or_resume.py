"""Training engine: full train/resume orchestration.

Workflow parity with /root/reference/command_handlers/train_or_resume.py:24-370
(fixed-seed init, stage-cascade warm start, PolynomialLR per epoch, autosave
with history pruning, best-val checkpoints, val-interval eval, early stopping,
ETA, TensorBoard, params.txt, final.weights) with a TPU-native execution
design:

* the model/optimizer initialize **on host CPU** (a TPU compile of ~300 init
  kernels through a remote tunnel costs minutes) and transfer replicated onto
  the data mesh;
* one jitted train step per stage fuses forward/backward/update/BN-stats
  (train/steps.py); per-step loss scalars are fetched one step late so the
  host never blocks the device pipeline (the reference `.item()`s four
  tensors every step, train_or_resume.py:448-451);
* the batch is sharded over all devices of a 1-D mesh
  (per-device batch == ``--batch-size``, matching the reference's
  one-process-per-GPU DDP semantics);
* validation runs on every process (collectives must be collective) but only
  the master rank logs and checkpoints, like the reference's rank-0 gating;
* NaN checking is available via ``jax.config.update('jax_debug_nans')``
  behind --debug (the reference's per-step asserts would force a device sync
  every step).
"""

import gc
import glob
import os
import os.path
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import termcolor
from tqdm.auto import tqdm

from .. import settings
from ..checkpoint import load_checkpoint_or_weights, save_checkpoint, save_weights
from ..data import (Loader, DevicePrefetcher, make_train_augment_fn,
                    make_eval_transform_fn, AugmentConfig)
from ..metrics import mIoU, Accuracy, AverageMeter
from ..models import DSRL, PolynomialLR, state_dict, load_state_dict, count_params
from ..ops.colorize import make_input_output_visualization
from ..parallel import (make_mesh, batch_sharding, replicate, is_master_rank,
                        data_shards_per_process,
                        initialize_distributed, rendezvous_barrier,
                        align_first_dispatch,
                        pad_batch_to_shards, count_valid_fn)
from ..train import (sgd_init, make_train_step, make_eval_step, TrainState,
                     optimizer_state_dict, load_optimizer_state_dict,
                     ungroup_pred_sample)
from ..utils import (INFO, CAUTION, FATAL, ConditionalContextManager,
                     makeSecondsPretty, prevent_system_sleep)
from ..utils.tb_writer import SummaryWriter
from ..models.host_init import init_model_host


def initialize_with_pretrained_weights(variables, weights_dir):
    """Load the torchvision ResNet101 zoo weights into the backbone
    (parity: /root/reference/models/modules/backbone/ResNet101.py:58-65).

    Looks for ``weights/resnet101_pretrained.pth``; attempts a download only
    if missing (will fail gracefully in air-gapped environments)."""
    path = os.path.join(weights_dir, 'resnet101_pretrained.pth')
    if not os.path.isfile(path):
        url = "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth"
        try:
            import urllib.request
            os.makedirs(weights_dir, exist_ok=True)
            print(INFO("Downloading pretrained ResNet101 weights..."))
            urllib.request.urlretrieve(url, path)
        except Exception as exc:
            print(CAUTION("Pretrained ResNet101 weights unavailable ({}); the "
                          "backbone keeps its Kaiming initialization.".format(exc)))
            return variables, False
    zoo = load_checkpoint_or_weights(path)
    prefixed = {'feature_extractor.backbone.' + k: v for k, v in zoo.items()
                if not k.startswith('fc.')}
    new_vars, missing, unexpected = load_state_dict(variables, prefixed, strict=False)
    backbone_missing = [k for k in missing
                        if k.startswith('feature_extractor.backbone.')
                        and not k.endswith('num_batches_tracked')]
    assert len(backbone_missing) == 0, \
        "BUG CHECK: Pretrained weights from model zoo for ResNet101 has missing keys: {}.".format(backbone_missing)
    return new_vars, True


def train_or_resume(is_resuming_training, device, distributed, mixed_precision,
                    disable_cudnn_benchmark, num_workers, dataset, val_interval,
                    checkpoint_interval, checkpoint_history, init_weights,
                    batch_size, epochs, learning_rate, end_learning_rate,
                    momentum, weights_decay, poly_power, stage, w1, w2,
                    freeze_batch_norm, experiment_id, description,
                    early_stopping, dry_run=False, **other_args):
    ds_settings = dataset['settings']
    if distributed:
        initialize_distributed(distributed)
    master = is_master_rank()

    # Every rank tracks the best-val state (it feeds the validation summary,
    # which runs collectively); only the master acts on it (checkpoint I/O).
    if is_resuming_training:
        best_validation_dict = other_args['best_validation_dict']
    else:
        best_validation_dict = {'epoch': -1, 'best_miou_percent': 0., 'loss': 0.}

    if master:
        process_start_timestamp = datetime.now()
        if prevent_system_sleep():
            print(INFO("System will NOT be allowed to sleep until this training is complete/interrupted."))

    compute_dtype = jnp.bfloat16 if settings.mixed_precision_to_dtype(mixed_precision) == 'bfloat16' \
        else jnp.float32

    mesh = make_mesh(spatial=settings.SPATIAL_SHARDS)
    n_local = jax.local_device_count()
    global_batch = batch_size * data_shards_per_process(mesh)

    # Model + optimizer state (host-initialized, fixed seed across processes —
    # parity with the reference's t.manual_seed(RANDOM_SEED) identical-init
    # contract, train_or_resume.py:28-31).
    model = DSRL(stage=stage, num_classes=ds_settings.NUM_CLASSES, dtype=compute_dtype)
    variables = init_model_host(model, settings.MODEL_INPUT_SIZE,
                                seed=settings.RANDOM_SEED)

    starting_epoch = 0
    resume_opt_state = None
    if is_resuming_training:
        variables, _, _ = load_state_dict(variables, other_args['model_state_dict'], strict=True)
        resume_opt_state = other_args['optimizer_state_dict']
        starting_epoch = other_args['epoch']
    elif init_weights:
        weights_dict = load_checkpoint_or_weights(init_weights)
        variables, _, _ = load_state_dict(variables, weights_dict['model_state_dict'], strict=False)
    elif stage == 1:
        if master:
            print(INFO("Pretrained weights for ResNet101 will be used to initialize network before training."))
        variables, _ = initialize_with_pretrained_weights(variables, settings.WEIGHTS_ROOT_DIR)
    else:
        prev_weights_filename = os.path.join(experiment_id,
                                             settings.WEIGHTS_DIR.format(stage=stage - 1),
                                             settings.FINAL_WEIGHTS_FILE)
        if os.path.isfile(prev_weights_filename):
            if master:
                print(INFO("'{:s}' weights file from previous stage was found and will be used "
                           "to initialize network before training.".format(prev_weights_filename)))
            weights_dict = load_checkpoint_or_weights(prev_weights_filename)
            variables, _, _ = load_state_dict(variables, weights_dict['model_state_dict'], strict=False)
        else:
            if master:
                print(CAUTION("'{:s}' weights file from previous stage was not found; initializing "
                              "with pretrained ResNet101 + Kaiming init.".format(prev_weights_filename)))
            variables, _ = initialize_with_pretrained_weights(variables, settings.WEIGHTS_ROOT_DIR)

    params = variables['params']
    batch_stats = variables['batch_stats']
    momentum_buffers = sgd_init(params)
    if resume_opt_state is not None:
        momentum_buffers = load_optimizer_state_dict(
            momentum_buffers, resume_opt_state,
            model_state_dict=other_args.get('model_state_dict'))

    # Align ranks before the first cross-process collective (the replicated
    # device_put below): host init / zoo loading skews ranks by far more
    # than the communicator's initialization window.
    rendezvous_barrier('pre-replicate')
    state = TrainState(params=replicate(params, mesh),
                       batch_stats=replicate(batch_stats, mesh),
                       momentum=replicate(momentum_buffers, mesh))
    del params, batch_stats, momentum_buffers, variables
    gc.collect()

    scheduler = PolynomialLR(learning_rate, max_decay_steps=epochs,
                             end_learning_rate=end_learning_rate, power=poly_power,
                             last_epoch=(starting_epoch - 1))

    # Data
    os.makedirs(dataset['path'], exist_ok=True)
    if len(dataset['class'](dataset['path'], split='train')) == 0 and not dry_run:
        raise Exception(FATAL("Cityscapes dataset was not found under '{:s}'.".format(dataset['path'])))

    aug_cfg = AugmentConfig(input_hw=settings.MODEL_INPUT_SIZE,
                            output_hw=settings.MODEL_OUTPUT_SIZE,
                            mean=ds_settings.MEAN, std=ds_settings.STD,
                            ignore_label=ds_settings.IGNORE_CLASS_LABEL)
    # Preferred input path: the native C++ data plane decodes AND affine-warps
    # (rotate/zoom-crop/flip/resize + label LUT) on host threads, overlapped
    # with device compute; the device applies only elementwise photometric ops
    # and matmul resizes.  The all-device warp is the fallback (its dynamic
    # gathers cost ~320 ms/step on TPU — see data/augment.py docstrings).
    from ..data.native import native_available, has_g16_labels
    from ..data import make_host_warp_transform, make_device_post_fn
    host_transform = None
    if native_available():
        # emit_position_labels: the decode threads also lay out the fused
        # tail kernel's label operand (see data/native.py).  The symbol is
        # optional (v4): a stale-but-usable library keeps decode+warp and the
        # train step builds the layout in-graph instead (~7 ms/step).
        # Spatial meshes disable the Pallas tail (train/steps.py), so the
        # operand would be computed (~3 ms/batch host) and staged H2D every
        # step just to be ignored — gate it off.
        spatial_mesh = mesh is not None and mesh.shape.get('spatial', 1) > 1
        emit_positions = not dry_run and not spatial_mesh and has_g16_labels()
        host_transform = make_host_warp_transform(aug_cfg, ds_settings.LABEL_MAPPING_LUT,
                                                  settings.RANDOM_SEED,
                                                  emit_position_labels=emit_positions,
                                                  rank=jax.process_index())
        # stage>1: emit the MSE target pre-unshuffled (the SISR loss's
        # layout) straight from the post emission write — see
        # data/augment.py::make_device_post_fn.  dry-run keeps full-res
        # img_hi (its synthetic losses run ungrouped).
        post_fn = make_device_post_fn(
            aug_cfg, dtype=compute_dtype,
            unshuffle_hi=8 if (stage > 1 and not dry_run) else 0,
            mesh=mesh)
        augment_fn = None  # photometric tail is fused into the train step
    else:
        post_fn = None
        augment_fn = make_train_augment_fn(aug_cfg, ds_settings.LABEL_MAPPING_LUT)
    eval_fn = make_eval_transform_fn(aug_cfg, ds_settings.LABEL_MAPPING_LUT)

    train_step = make_train_step(model, stage, w1, w2, momentum, weights_decay,
                                 ds_settings.IGNORE_CLASS_LABEL, freeze_batch_norm,
                                 mesh, dry_run, ds_settings.NUM_CLASSES,
                                 post_fn=post_fn)
    eval_step = make_eval_step(model, stage, w1, w2, ds_settings.NUM_CLASSES,
                               ds_settings.IGNORE_CLASS_LABEL, dry_run,
                               mesh=mesh)

    train_loader = Loader(dataset['class'](dataset['path'], split='train'),
                          batch_size=global_batch, shuffle=True,
                          seed=settings.RANDOM_SEED, drop_last=True,
                          num_workers=num_workers,
                          world_size=jax.process_count(), rank=jax.process_index(),
                          host_transform=host_transform, raw_cache='env')
    val_loader = Loader(dataset['class'](dataset['path'], split='val'),
                        batch_size=global_batch, shuffle=False, drop_last=False,
                        num_workers=num_workers,
                        world_size=jax.process_count(), rank=jax.process_index(),
                        raw_cache='env')

    # Raw-cache priming: when DSRL_TPU_RAW_CACHE is active, background
    # threads decode each rank's epoch-0 shard into the cache through the
    # minutes of host-idle compile/warmup time before step 1, so the warm
    # (~2 ms raw read) rate applies from the FIRST epoch.  Disable with
    # DSRL_TPU_PRIME_RAW_CACHE=0.  (data/pipeline.py::prime_raw_cache)
    if os.environ.get('DSRL_TPU_PRIME_RAW_CACHE', '1') != '0':
        # Prime the epoch the run will actually read first: the epoch loop
        # starts at starting_epoch + 1, and per-rank shards are epoch-keyed
        # (ShardedSampler re-permutes globally per epoch before striding).
        for _ldr, _split in ((train_loader, 'train'), (val_loader, 'val')):
            if _ldr.prime_raw_cache(epoch=starting_epoch + 1) is not None \
                    and master:
                print(INFO("Priming raw pair cache for the '{:s}' split in the "
                           "background.".format(_split)))

    train_logs_dir = os.path.join(experiment_id, settings.LOGS_DIR.format(stage=stage, mode='train'))
    val_logs_dir = os.path.join(experiment_id, settings.LOGS_DIR.format(stage=stage, mode='val'))
    os.makedirs(train_logs_dir, exist_ok=True)
    os.makedirs(val_logs_dir, exist_ok=True)

    # Dropout/augmentation stream.  On TPU the hardware RBG generator is used:
    # the three full-resolution dropout masks per step make threefry cost
    # ~5 ms/step (~6% throughput); rbg is deterministic per seed on a fixed
    # topology, which is all the reference's fixed-seed contract promises.
    from ..utils.backend import resolve_backend
    rng_impl = 'rbg' if resolve_backend() == 'tpu' else 'threefry2x32'
    rng = jax.random.key(settings.RANDOM_SEED + 1000 * (starting_epoch + 1),
                         impl=rng_impl)

    def get_state_dicts():
        # Called under `if master:` only — a packed state is read through
        # device_get_state() (one fetch + numpy unpack, train/packing.py)
        # so no device computation is ever launched from a single rank of
        # a multi-process mesh.
        if hasattr(state, 'device_get_state'):
            host = state.device_get_state()
            host_vars = {'params': host.params, 'batch_stats': host.batch_stats}
            host_mom = host.momentum
        else:
            host_vars = jax.device_get({'params': state.params,
                                        'batch_stats': state.batch_stats})
            host_mom = jax.device_get(state.momentum)
        model_sd = state_dict(host_vars)
        opt_sd = optimizer_state_dict(host_mom,
                                      learning_rate, momentum, weights_decay)
        return model_sd, opt_sd

    with ConditionalContextManager(master, lambda: SummaryWriter(train_logs_dir)) as train_logger, \
         ConditionalContextManager(master, lambda: SummaryWriter(val_logs_dir)) as val_logger:

        if master:
            _write_params_file(
                os.path.join(train_logs_dir, settings.PARAMS_FILE),
                "Timestamp: {:s}".format(process_start_timestamp.strftime("%c")),
                "Device: {:s}".format(device),
                "Distributed: {:}".format(distributed) if distributed else None,
                "Mixed Precision: {:s}".format(mixed_precision) if mixed_precision else None,
                "No. of workers: {:d}".format(num_workers),
                "Dataset: {:s}".format(dataset.get('name', 'cityscapes')),
                "Dataset path: {:s}".format(dataset['path']),
                "Validation interval: {:d}".format(val_interval),
                "Checkpoint interval: {:d}".format(checkpoint_interval),
                "Checkpoint history: {:d}".format(checkpoint_history),
                "Initial weights: {:s}".format(init_weights) if init_weights else None,
                "Resuming checkpoint: {:s}".format(other_args['checkpoint']) if is_resuming_training and other_args.get('checkpoint') else None,
                "Batch size: {:d}".format(batch_size),
                "Epochs: {:d}".format(epochs),
                "Learning rate: {:f}".format(learning_rate),
                "End learning rate: {:f}".format(end_learning_rate),
                "Momentum: {:f}".format(momentum),
                "Weights decay: {:f}".format(weights_decay),
                "Poly power: {:f}".format(poly_power),
                "Stage: {:d}".format(stage),
                "Loss Weight 1: {:.4f}".format(w1) if stage > 1 else None,
                "Loss Weight 2: {:.4f}".format(w2) if stage > 2 else None,
                "Freeze batch normalization: {:}".format(freeze_batch_norm),
                "Experiment ID: {:}".format(experiment_id) if experiment_id else None,
                "Description: {:s}".format(description) if description else None,
                "Early stopping: {:}".format(early_stopping),
                "Devices: {:d} x {:s}".format(n_local, jax.devices()[0].platform))

            n_train_params = count_params({'params': jax.tree_util.tree_map(lambda x: x, state.params)})[0]
            print(INFO("Total training parameters: {:,}".format(n_train_params)))
            train_logger.add_text("INFO", "Total training parameters: {:,}".format(n_train_params), starting_epoch + 1)
            train_logger.add_text("INFO", "Training started on {:s}.".format(process_start_timestamp.strftime("%c")), starting_epoch + 1)
            print(INFO("################################# Stage {:d} training STARTED #################################\n".format(stage), prefix='\n'))
            training_epoch_timetaken_list = []

        CE_train_avg_loss = MSE_train_avg_loss = FA_train_avg_loss = Avg_train_loss = None
        CE_val_avg_loss = MSE_val_avg_loss = FA_val_avg_loss = Avg_val_loss = None
        stop_early = False

        for epoch in range(starting_epoch + 1, epochs + 1):
            if master:
                print("\n=> EPOCH {0:d}/{1:d}".format(epoch, epochs))
                print("Learning Rate: {:6f}".format(scheduler.get_last_lr()[0]))
                training_epoch_begin_timestamp = datetime.now()

            rng, epoch_rng = jax.random.split(rng)
            state, train_losses = _train_epoch(
                state, train_step, train_loader, augment_fn, mesh, epoch,
                epoch_rng, scheduler.get_last_lr()[0], stage, master)
            CE_train_avg_loss, MSE_train_avg_loss, FA_train_avg_loss, Avg_train_loss = train_losses

            if master:
                train_logger.add_scalar("Stage {:d}/CE Loss".format(stage), CE_train_avg_loss, epoch)
                if stage > 1:
                    train_logger.add_scalar("Stage {:d}/MSE Loss".format(stage), MSE_train_avg_loss, epoch)
                    if stage > 2:
                        train_logger.add_scalar("Stage {:d}/FA Loss".format(stage), FA_train_avg_loss, epoch)
                    train_logger.add_scalar("Stage {:d}/Total Loss".format(stage), Avg_train_loss, epoch)
                train_logger.add_scalar("Stage {:d}/Learning rate".format(stage), scheduler.get_last_lr()[0], epoch)

                # Autosave checkpoint + prune history (train_or_resume.py:264-290).
                if checkpoint_history > 0 and epoch % checkpoint_interval == 0:
                    model_state_dict, opt_sd = get_state_dicts()
                    _save_full_checkpoint(
                        experiment_id, stage, settings.CHECKPOINT_FILE.format(epoch=epoch),
                        locals_dict=dict(
                            device=device, mixed_precision=mixed_precision,
                            amp_state_dict=None, disable_cudnn_benchmark=disable_cudnn_benchmark,
                            num_workers=num_workers, val_interval=val_interval,
                            checkpoint_interval=checkpoint_interval,
                            checkpoint_history=checkpoint_history, init_weights=init_weights,
                            batch_size=batch_size, epochs=epochs, learning_rate=learning_rate,
                            end_learning_rate=end_learning_rate, momentum=momentum,
                            weights_decay=weights_decay, poly_power=poly_power, stage=stage,
                            w1=w1, w2=w2, freeze_batch_norm=freeze_batch_norm,
                            experiment_id=experiment_id, description=description,
                            early_stopping=early_stopping,
                            CE_train_avg_loss=CE_train_avg_loss,
                            MSE_train_avg_loss=MSE_train_avg_loss,
                            FA_train_avg_loss=FA_train_avg_loss,
                            Avg_train_loss=Avg_train_loss,
                            CE_val_avg_loss=CE_val_avg_loss,
                            MSE_val_avg_loss=MSE_val_avg_loss,
                            FA_val_avg_loss=FA_val_avg_loss,
                            Avg_val_loss=Avg_val_loss, epoch=epoch,
                            best_validation_dict=best_validation_dict,
                            model_state_dict=model_state_dict,
                            optimizer_state_dict=opt_sd))
                    print(INFO("Autosaved checkpoint for epoch {0:d} under '{1:s}'.".format(
                        epoch, settings.CHECKPOINTS_DIR.format(stage=stage))))
                    checkpoint_epoch_to_delete = epoch - checkpoint_history * checkpoint_interval
                    if checkpoint_epoch_to_delete > 0:
                        old = os.path.join(experiment_id,
                                           settings.CHECKPOINTS_DIR.format(stage=stage),
                                           settings.CHECKPOINT_FILE.format(epoch=checkpoint_epoch_to_delete))
                        if os.path.isfile(old):
                            os.remove(old)

            # Validation every val_interval epochs (all processes participate;
            # only the master logs — see module docstring).
            if epoch % val_interval == 0:
                val_losses, val_miou, val_accuracy = _val_epoch(
                    state, eval_step, val_loader, eval_fn, mesh, epoch, stage,
                    master, val_logger, ds_settings, best_validation_dict)
                CE_val_avg_loss, MSE_val_avg_loss, FA_val_avg_loss, Avg_val_loss = val_losses

                if master:
                    val_logger.add_scalar("Stage {:d}/CE Loss".format(stage), CE_val_avg_loss, epoch)
                    if stage > 1:
                        val_logger.add_scalar("Stage {:d}/MSE Loss".format(stage), MSE_val_avg_loss, epoch)
                        if stage > 2:
                            val_logger.add_scalar("Stage {:d}/FA Loss".format(stage), FA_val_avg_loss, epoch)
                        val_logger.add_scalar("Stage {:d}/Total Loss".format(stage), Avg_val_loss, epoch)
                    val_logger.add_scalar("Stage {:d}/Accuracy %".format(stage), val_accuracy, epoch)
                    val_logger.add_scalar("Stage {:d}/mIoU %".format(stage), val_miou, epoch)

                    if val_miou > best_validation_dict['best_miou_percent']:
                        best_validation_dict['epoch'] = epoch
                        best_validation_dict['best_miou_percent'] = val_miou
                        best_validation_dict['loss'] = Avg_val_loss
                        model_state_dict, opt_sd = get_state_dicts()
                        ckpt_dir = os.path.join(experiment_id, settings.CHECKPOINTS_DIR.format(stage=stage))
                        for x in glob.glob(os.path.join(ckpt_dir, "*_bestval.checkpoint")):
                            if os.path.isfile(x):
                                os.remove(x)
                        _save_full_checkpoint(
                            experiment_id, stage,
                            settings.CHECKPOINT_FILE.format(epoch='{:d}_bestval'.format(epoch)),
                            locals_dict=dict(
                                device=device, mixed_precision=mixed_precision,
                                amp_state_dict=None, disable_cudnn_benchmark=disable_cudnn_benchmark,
                                num_workers=num_workers, val_interval=val_interval,
                                checkpoint_interval=checkpoint_interval,
                                checkpoint_history=checkpoint_history, init_weights=init_weights,
                                batch_size=batch_size, epochs=epochs, learning_rate=learning_rate,
                                end_learning_rate=end_learning_rate, momentum=momentum,
                                weights_decay=weights_decay, poly_power=poly_power, stage=stage,
                                w1=w1, w2=w2, freeze_batch_norm=freeze_batch_norm,
                                experiment_id=experiment_id, description=description,
                                early_stopping=early_stopping,
                                CE_train_avg_loss=CE_train_avg_loss,
                                MSE_train_avg_loss=MSE_train_avg_loss,
                                FA_train_avg_loss=FA_train_avg_loss,
                                Avg_train_loss=Avg_train_loss,
                                CE_val_avg_loss=CE_val_avg_loss,
                                MSE_val_avg_loss=MSE_val_avg_loss,
                                FA_val_avg_loss=FA_val_avg_loss,
                                Avg_val_loss=Avg_val_loss, epoch=epoch,
                                best_validation_dict=best_validation_dict,
                                model_state_dict=model_state_dict,
                                optimizer_state_dict=opt_sd))

                # The early-stop decision happens OUTSIDE the master gate: the
                # loss averages derive from the same replicated device scalars
                # on every process, so each process reaches the same verdict
                # and breaks out of the (collective) epoch loop together.  A
                # master-only break would leave the other ranks blocked in the
                # next epoch's collectives.
                if Avg_train_loss < Avg_val_loss:
                    if early_stopping:
                        stop_early = True
                        if master:
                            log_string = "Early stopping was triggered at epoch {:d}.".format(epoch)
                            train_logger.add_text("INFO", log_string, epoch)
                            print(INFO(log_string))
                    elif master:
                        print(CAUTION("Average training loss < Average validation loss!"))
            if stop_early:
                break

            scheduler.step()

            if master and epoch < epochs:
                training_epoch_timetaken_list.append(
                    (datetime.now() - training_epoch_begin_timestamp).total_seconds())
                avg_t = np.mean(training_epoch_timetaken_list[(-val_interval * 2):])
                print(INFO("Est. training completion in {:s}.".format(
                    makeSecondsPretty(avg_t * (epochs - epoch)))))

        if os.environ.get('DSRL_TPU_DEBUG_PARAM_DIGEST'):
            # Test hook (tests/test_cli_distributed.py): EVERY rank prints a
            # content hash of its final params so a multi-process run can be
            # checked for cross-rank divergence.  Uses the master-safe host
            # read path (one replicated-buffer fetch + numpy unpack — never
            # the jitted .params unpack, which single ranks must not
            # dispatch).
            import hashlib
            if hasattr(state, 'device_get_state'):
                host_params = state.device_get_state().params
            else:
                host_params = jax.device_get(state.params)
            digest = hashlib.sha256()
            for leaf in jax.tree_util.tree_leaves(host_params):
                digest.update(np.ascontiguousarray(leaf).tobytes())
            # (the epoch loop can be empty when resuming at the final epoch)
            last_epoch_run = locals().get('epoch', starting_epoch)
            print("PARAM_DIGEST rank={:d} epoch={:d} {:s}".format(
                jax.process_index(), last_epoch_run, digest.hexdigest()),
                flush=True)

        if master:
            model_state_dict, _ = get_state_dicts()
            save_weights(os.path.join(experiment_id, settings.WEIGHTS_DIR.format(stage=stage)),
                         settings.FINAL_WEIGHTS_FILE, model_state_dict, mixed_precision)
            process_end_timestamp = datetime.now()
            elapsed = (process_end_timestamp - process_start_timestamp).total_seconds()
            train_logger.add_text("INFO", "Training took {0:s} and completed on {1:s}.".format(
                makeSecondsPretty(elapsed), process_end_timestamp.strftime("%c")), epochs)
            print(INFO("################################# Stage {:d} training ENDED #################################".format(stage), prefix='\n'))

        # Re-align before process exit: the master just spent seconds-to-
        # minutes on final-weights I/O that no other rank performs, and
        # jax.distributed's atexit Shutdown barrier has a FIXED timeout —
        # exceeding it kills the surviving ranks with a misleading
        # connection-reset cascade.  (Same window as align_first_dispatch,
        # at the other end of the run.)
        rendezvous_barrier('post-train')


def _train_epoch(state, train_step, loader, augment_fn, mesh, epoch, rng, lr,
                 stage, master):
    CE_avg = AverageMeter()
    MSE_avg = AverageMeter()
    FA_avg = AverageMeter()
    Total_avg = AverageMeter()
    loader.set_epoch(epoch)
    sharding = batch_sharding(mesh, 4)
    sharding3 = batch_sharding(mesh, 3)

    pending = None  # (device losses, batch size) fetched one step late
    with ConditionalContextManager(master, lambda: tqdm(
            total=len(loader), desc='TRAINING', colour='green', position=0,
            leave=False, bar_format=settings.PROGRESSBAR_FORMAT)) as progressbar:
        labs_sharding = NamedSharding(mesh, P(None, 'data'))

        def stage_batch(batch):
            # Runs on the DevicePrefetcher thread: the H2D copies overlap
            # the previous step's device compute instead of serializing
            # with dispatch here.
            imgs_dev = jax.make_array_from_process_local_data(sharding, batch[0])
            segs_dev = jax.make_array_from_process_local_data(sharding3, batch[1])
            labs_dev = None
            if augment_fn is None and len(batch) > 2:
                labs_dev = jax.make_array_from_process_local_data(
                    labs_sharding, batch[2])
            return imgs_dev, segs_dev, labs_dev, batch[0].shape[0]

        def dispatch(*args):
            # Multi-process only: the step's very first execution initializes
            # its cross-process communicator contexts — a hard ~30 s window —
            # while its compile happens lazily AT that execution and skews
            # across ranks by minutes when persistent-cache hits differ.
            # AOT-compile on the real args + barrier so every rank enters the
            # first execution together (parallel.align_first_dispatch).
            if not getattr(train_step, '_first_dispatch_aligned', False):
                train_step._first_dispatch_aligned = True
                if hasattr(train_step, 'ensure_packed'):
                    # Pack once, up front: .lower() and the real call would
                    # otherwise EACH pack the plain startup state (~1050
                    # leaves through the jitted pack program).
                    args = (train_step.ensure_packed(args[0]),) + args[1:]
                align_first_dispatch(
                    'train-step-stage{}'.format(stage),
                    lambda: train_step.lower(*args).compile())
            return train_step(*args)

        for imgs_dev, segs_dev, labs_dev, local_bs in DevicePrefetcher(
                loader, stage_batch):
            rng, aug_rng, step_rng = jax.random.split(rng, 3)
            if augment_fn is None:
                # Host-warp path: the loader delivered warped uint8 (plus,
                # when the native plane emitted it, the fused tail kernel's
                # position-major label operand); the photometric tail is
                # fused inside the train step.
                if labs_dev is not None:
                    state, losses = dispatch(state, imgs_dev, segs_dev,
                                             jnp.float32(lr), step_rng,
                                             labs_dev)
                else:
                    state, losses = dispatch(state, imgs_dev, segs_dev,
                                             jnp.float32(lr), step_rng)
            else:
                (img_lo, img_hi), (seg_hi, _) = augment_fn(imgs_dev, segs_dev, aug_rng)
                state, losses = dispatch(state, img_lo, img_hi, seg_hi,
                                         jnp.float32(lr), step_rng)

            if pending is not None:
                _update_meters(pending, CE_avg, MSE_avg, FA_avg, Total_avg)
            pending = (losses, local_bs)

            if master:
                log = ["CE: {:.4f}".format(CE_avg() if CE_avg.count else 0.0)]
                if stage > 1:
                    log.append("MSE: {:.4f}".format(MSE_avg() if MSE_avg.count else 0.0))
                    if stage > 2:
                        log.append("FA: {:.4f}".format(FA_avg() if FA_avg.count else 0.0))
                    log.append("Total: {:.3f}".format(Total_avg() if Total_avg.count else 0.0))
                progressbar.set_postfix_str("[{:s}]".format(', '.join(log)))
                progressbar.update()
    if pending is not None:
        _update_meters(pending, CE_avg, MSE_avg, FA_avg, Total_avg)

    if master:
        log = ["Avg. CE: {:.4f}".format(CE_avg())]
        if stage > 1:
            log.append("Avg. MSE: {:.4f}".format(MSE_avg()))
            if stage > 2:
                log.append("Avg. FA: {:.4f}".format(FA_avg()))
            log.append("Total Avg. Loss: {:.3f}".format(Total_avg()))
        print(', '.join(log))
    return state, (CE_avg(), MSE_avg(), FA_avg(), Total_avg())


def _update_meters(pending, CE_avg, MSE_avg, FA_avg, Total_avg):
    losses, n = pending
    host = jax.device_get(losses)
    CE_avg.update(float(host['CE']), n)
    MSE_avg.update(float(host['MSE']), n)
    FA_avg.update(float(host['FA']), n)
    Total_avg.update(float(host['Total']), n)


def _val_epoch(state, eval_step, loader, eval_fn, mesh, epoch, stage, master,
               logger, ds_settings, best_validation_dict):
    CE_avg = AverageMeter()
    MSE_avg = AverageMeter()
    FA_avg = AverageMeter()
    Total_avg = AverageMeter()
    miou = mIoU(num_classes=ds_settings.NUM_CLASSES)
    mean_accuracy = Accuracy()
    sharding = batch_sharding(mesh, 4)
    sharding3 = batch_sharding(mesh, 3)
    sharding1 = batch_sharding(mesh, 1)

    # Unseeded global-RNG index on purpose: the reference picks its example
    # visualization with the unseeded numpy RNG too (train_or_resume.py:399),
    # and it must not consume the seeded training stream.
    example_index = np.random.randint(0, max(len(loader), 1)) if master else -1
    n_shards = data_shards_per_process(mesh)

    with ConditionalContextManager(master, lambda: tqdm(
            total=len(loader), desc='VALIDATING', colour='yellow', position=1,
            leave=False, bar_format=settings.PROGRESSBAR_FORMAT)) as progressbar:
        def stage_val_batch(batch):
            # drop_last=False: the Loader also yields its per-sample valid
            # mask (cyclic shard-padding duplicates, pipeline.ShardedSampler).
            imgs_u8, segs_u8, valid = batch
            # Pad ragged final batches up to the shard count; the sample mask
            # (shard duplicates AND batch padding) removes masked rows from
            # every loss/metric (steps.make_eval_step).  The mask is
            # assembled into a GLOBAL array exactly like the image/label
            # batches so its length matches theirs under multi-process runs
            # (process-local length != global length).
            imgs_u8, segs_u8, mask = pad_batch_to_shards(imgs_u8, segs_u8,
                                                         n_shards, valid)
            return (jax.make_array_from_process_local_data(sharding, imgs_u8),
                    jax.make_array_from_process_local_data(sharding3, segs_u8),
                    jax.make_array_from_process_local_data(sharding1, mask))

        # Per-batch GLOBAL valid-image count as a replicated device scalar:
        # each process's local count differs on the ragged final batch, so
        # weighting the (global) masked per-batch loss means by it would give
        # every process a differently mis-weighted epoch average — and the
        # early-stopping / bestval bookkeeping feeds off these numbers.
        count_valid = count_valid_fn(mesh)

        # Per-batch results stay ON DEVICE until the pass ends: a device_get
        # inside the loop drains the dispatch queue between batches (the
        # pending payload is 4 scalars + three 19-vectors + 2 counts each).
        pending = []
        for i, (imgs_dev, segs_dev, mask_dev) in enumerate(
                DevicePrefetcher(loader, stage_val_batch)):
            (img_lo, img_hi), (seg_hi, _) = eval_fn(imgs_dev, segs_dev)
            # Multi-process: align the first eval dispatch the same way the
            # train step aligns (compile skew + master-only checkpoint I/O
            # between the train and val passes both desynchronize ranks
            # ahead of this NEW program's communicator init).
            if not getattr(eval_step, '_first_dispatch_aligned', False):
                eval_step._first_dispatch_aligned = True
                align_first_dispatch(
                    'eval-step-stage{}'.format(stage),
                    lambda: eval_step.aot_compile(state, img_lo, img_hi,
                                                  seg_hi, mask_dev))
            # from_state keeps a packed train state packed across the eval
            # boundary (train/packing.py) instead of re-materializing ~900
            # small parameter buffers per batch.
            losses, pred, hists, acc = eval_step.from_state(
                state, img_lo, img_hi, seg_hi, mask_dev)
            pending.append((losses, hists, acc, count_valid(mask_dev)))

            if master:
                progressbar.update()
                if i == example_index:
                    _log_example_image(logger, img_hi, pred,
                                       eval_step.pred_layout, ds_settings,
                                       epoch)

    for losses, hists, acc, n_dev in pending:
        _update_meters((losses, int(jax.device_get(n_dev))),
                       CE_avg, MSE_avg, FA_avg, Total_avg)
        miou.update_from_areas(*jax.device_get(hists))
        mean_accuracy.update_from_counts(*[int(v) for v in jax.device_get(acc)])

    if master:
        log = ["Avg. CE: {:.4f}".format(CE_avg())]
        if stage > 1:
            log.append("Avg. MSE: {:.4f}".format(MSE_avg()))
            if stage > 2:
                log.append("Avg. FA: {:.4f}".format(FA_avg()))
            log.append("Total Avg. Loss: {:.3f}".format(Total_avg()))
        log.append("Accuracy %: {:.2f}".format(mean_accuracy()))
        log.append("mIoU %: {:.2f}".format(miou()))
        log.append("Best mIoU % yet is {:.2f} at epoch {:d}.".format(
            max(miou(), best_validation_dict['best_miou_percent']),
            epoch if miou() > best_validation_dict['best_miou_percent'] else best_validation_dict['epoch']))
        print(termcolor.colored("Validation results:\n{:s}".format(', '.join(log)), 'yellow'))

    return (CE_avg(), MSE_avg(), FA_avg(), Total_avg()), miou(), mean_accuracy()




def _first_local_sample(arr, axis=0):
    """First locally-addressable sample (along ``axis``) of a sharded batch.

    A global array is not fully addressable from one process, so this works
    from ``addressable_shards`` rather than jax.device_get-ing the whole
    thing — and a SINGLE sample can itself span several local shards (a
    spatial mesh shards image height), so the sample is assembled from every
    local shard covering its batch index via the shards' global-index
    slices; one H-shard alone would render a 1/k-height visualization."""
    shards = getattr(arr, 'addressable_shards', None)
    if not shards:
        return np.take(np.asarray(jax.device_get(arr)), 0, axis=axis)
    b0 = min(s.index[axis].start or 0 for s in shards)
    sample_shape = tuple(d for i, d in enumerate(arr.shape) if i != axis)
    out = None
    for s in shards:
        if (s.index[axis].start or 0) != b0:
            continue
        piece = np.take(np.asarray(s.data), 0, axis=axis)
        if out is None:
            out = np.zeros(sample_shape, piece.dtype)
        dst = tuple(sl for i, sl in enumerate(s.index) if i != axis)
        out[dst] = piece
    return out


def _log_example_image(logger, img_hi, pred, pred_layout, ds_settings, epoch):
    """One random validation visualization per pass
    (train_or_resume.py:484-494): denormalized input | seg | overlay.
    ``pred`` arrives in the eval step's compact layout (``pred_layout`` =
    the step's ``fn.pred_layout``); only the one displayed sample is
    reconstructed, on host."""
    img = _first_local_sample(img_hi)  # (H, W, 3) normalized
    img = img * np.asarray(ds_settings.STD) + np.asarray(ds_settings.MEAN)
    img = np.clip(img * 255.0, 0.0, 255.0).astype(np.uint8).transpose(2, 0, 1)
    # The fused ('g16') layout carries the sample axis SECOND — (16, B, h,
    # w); the other layouts are sample-major.
    sample_axis = 1 if pred_layout == 'g16' else 0
    pred0 = ungroup_pred_sample(_first_local_sample(pred, axis=sample_axis),
                                pred_layout)
    logger.add_image("EXAMPLE",
                     make_input_output_visualization(img, pred0, ds_settings.CLASS_RGB_COLOR),
                     epoch)


def _save_full_checkpoint(experiment_id, stage, filename, locals_dict):
    """Persist the exact VARIABLES_IN_CHECKPOINT schema
    (/root/reference/settings.py:76-80)."""
    checkpoint_variables_dict = {}
    for var in settings.VARIABLES_IN_CHECKPOINT:
        checkpoint_variables_dict[var] = locals_dict[var]
    save_checkpoint(os.path.join(experiment_id, settings.CHECKPOINTS_DIR.format(stage=stage)),
                    filename, **checkpoint_variables_dict)


def _write_params_file(filename, *list_params):
    list_params = [x for x in list_params if x is not None]
    with open(filename, mode='w') as params_file:
        params_file.write('\n'.join(list_params))
