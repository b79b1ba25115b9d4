"""DSRL-TPU command-line entry point.

Public surface parity with /root/reference/main.py:112-208 — the same 11
subcommands with the same options and validation behavior:
train / config-train / resume-train / test / purge-weights-logs /
print-model / purne-weights (sic, kept as an alias) / prune-weights /
inspect-checkpoint / edit-checkpoint / benchmark / compile-model.

TPU-native deviations (each accepted-and-mapped rather than removed):
* --device: cpu/tpu ('gpu' is a warning alias for tpu);
* --mixed-precision: apex opt-levels map onto bf16 compute (no loss scaling
  on TPU), 'BF16' accepted directly;
* --distributed MASTER_ADDR MASTER_PORT NODES DEVICES_PER_NODE BACKEND
  INIT_METHOD NODE_ID: one process drives all local TPU chips, so no
  per-device spawn (/root/reference/main.py:415-416); NODES/NODE_ID map to
  jax.distributed process count/id, BACKEND is ignored with a warning;
* --profile wraps the command in jax.profiler (TensorBoard/Perfetto trace
  under outputs/profile) instead of torch.autograd.profiler.
"""

import argparse
import json
import multiprocessing
import os
import os.path
import shutil
import sys

import numpy as np

# NB: importing jax is cheap here (the site hook pre-imports it); platform
# selection happens at first backend use, so --device cpu can still switch.
import jax

from dualsuperreslearningforsemseg_tpu import settings
from dualsuperreslearningforsemseg_tpu import commands as command_handlers
from dualsuperreslearningforsemseg_tpu.utils import (
    INFO, CAUTION, FATAL, OverridePrintWithTQDMWriteAndLog, hasExtension,
    isInvalidFilename, INVALID_FILENAME_CHARS, check_version,
    ValidateDatasetNameAndSplit, ValidateDatasetNameSplitAndIndex,
    ValidateDistributedTrainingOptions)
from dualsuperreslearningforsemseg_tpu.checkpoint import load_checkpoint_or_weights


def _select_platform(args):
    device = settings.resolve_device(getattr(args, 'device', settings.DEFAULT_DEVICE))
    if getattr(args, 'device', None) == 'gpu':
        print(CAUTION("--device gpu is interpreted as the TPU accelerator on this build."))
    if device == 'cpu':
        try:
            jax.config.update('jax_platforms', 'cpu')
        except Exception:
            pass
    else:
        # Persistent compilation cache: TPU compiles are expensive (remote
        # tunnels especially); repeat invocations hit the cache.  Keyed
        # 'tpu' from the string alone — resolve_backend() would have to
        # initialize the backend here, making every CLI command (even ones
        # that then compute on the host, like print-model) block at startup
        # whenever the TPU tunnel is wedged.
        try:
            from dualsuperreslearningforsemseg_tpu.utils.fsutil import compile_cache_dir
            jax.config.update('jax_compilation_cache_dir', compile_cache_dir('tpu'))
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        except Exception:
            pass
    if getattr(args, 'debug_nans', False):
        # TPU-native equivalent of the reference's per-step NaN asserts
        # (/root/reference/command_handlers/train_or_resume.py:406-433) — the
        # runtime re-runs any op producing NaN in op-by-op mode and raises.
        jax.config.update('jax_debug_nans', True)
    return device


def main(args):
    # Load variables from checkpoint if resuming training (main.py:48-52).
    if args['command'] == 'resume-train':
        checkpoint_dict = load_checkpoint_or_weights(args['checkpoint'])
        for variable in settings.VARIABLES_IN_CHECKPOINT:
            args[variable] = checkpoint_dict[variable]

    # Resolve dataset registry entry (main.py:58-70).
    if 'dataset' in args and args['dataset']:
        if isinstance(args['dataset'], str):
            args['dataset'] = [args['dataset'], 'train', 0]
        dataset_dict = dict(settings.DATASETS[args['dataset'][0]])
        dataset_dict['name'] = args['dataset'][0]
        if len(args['dataset']) > 1:
            dataset_dict['split'] = args['dataset'][1]
        if len(args['dataset']) > 2:
            dataset_dict['starting_index'] = args['dataset'][2]
        args['dataset'] = dataset_dict

    if args['command'] in ['train', 'resume-train']:
        train_logs_dir = os.path.join(args['experiment_id'],
                                      settings.LOGS_DIR.format(stage=args['stage'], mode='train'))
        os.makedirs(train_logs_dir, exist_ok=True)
        with OverridePrintWithTQDMWriteAndLog(os.path.join(train_logs_dir, settings.STDOUT_FILE)) as stdout:
            try:
                args['is_resuming_training'] = (args['command'] == 'resume-train')
                command_handlers.train_or_resume(**args)
            except KeyboardInterrupt as ex:
                stdout.write("Caught Ctrl+c to interrupt training!")
                raise ex
            except Exception as ex:
                stdout.write("Exception caught: {}".format(str(ex)))
                raise ex
    else:
        with OverridePrintWithTQDMWriteAndLog():
            command = args['command'].replace('-', '_')
            if command == 'purne_weights':    # reference's misspelled public name
                command = 'prune_weights'
            command_func_to_call = getattr(command_handlers, command, None)
            assert command_func_to_call, \
                "BUG CHECK: Command '{:s}' does not have any implementation under 'commands' package.".format(args['command'])
            command_func_to_call(**args)


def parse_cmdline_and_invoke_main(args):
    assert check_version(sys.version_info, *settings.MIN_PYTHON_VERSION), \
        FATAL("This program needs at least Python {0:d}.{1:d} interpreter.".format(*settings.MIN_PYTHON_VERSION))
    assert check_version(jax.__version__, *settings.MIN_JAX_VERSION), \
        FATAL("This program needs at least JAX {0:d}.{1:d}.".format(*settings.MIN_JAX_VERSION))
    assert check_version(np.__version__, *settings.MIN_NUMPY_VERSION), \
        FATAL("This program needs at least NumPy {0:d}.{1:d}.".format(*settings.MIN_NUMPY_VERSION))

    parser = None
    try:
        parser = argparse.ArgumentParser(
            description="TPU-native implementation of 'Dual Super Resolution Learning For Semantic Segmentation', CVPR 2020 paper.")
        command_parser = parser.add_subparsers(title='commands', dest='command', required=True)

        train_parser = command_parser.add_parser('train', help="Train a stage of the DSRL model")
        train_parser.add_argument('--device', default=settings.DEFAULT_DEVICE, type=str.casefold, choices=settings.SUPPORTED_DEVICES, help="Backend the model runs on (cpu or tpu)")
        train_parser.add_argument('--distributed', required=False, nargs=7, metavar=('MASTER_ADDR', 'MASTER_PORT', 'NODES', 'DEVICES_PER_NODE', 'BACKEND', 'INIT_METHOD', 'NODE_ID'), const=settings.SUPPORTED_DISTRIBUTED_BACKENDS, action=ValidateDistributedTrainingOptions, help="Multi-host training topology (reference DDP tuple; NODES/NODE_ID map to jax.distributed)")
        train_parser.add_argument('--mixed-precision', default=settings.DEFAULT_AMP_OPTIMIZATION_OPTION, type=str.upper, choices=[x for x in settings.AMP_OPTIMIZATION_OPTIONS if x], help="bf16 mixed-precision compute; apex opt-level strings (O0-O3) are accepted and mapped")
        train_parser.add_argument('--disable-cudnn-benchmark', action='store_true', help="Accepted for CLI compatibility; no-op on TPU")
        train_parser.add_argument('--profile', action='store_true', help="Enable JAX profiling (TensorBoard/Perfetto trace)")
        train_parser.add_argument('--num-workers', default=settings.DEFAULT_NUM_WORKERS, type=int, help="Host threads decoding/augmenting input batches")
        train_parser.add_argument('--dataset', required=True, type=str.casefold, choices=settings.DATASETS.keys(), help="Registered dataset to train on")
        train_parser.add_argument('--val-interval', default=settings.DEFAULT_VAL_INTERVAL, type=int, help="Run validation every N epochs")
        train_parser.add_argument('--checkpoint-interval', default=settings.DEFAULT_CHECKPOINT_INTERVAL, type=int, help="Autosave a full checkpoint every N epochs")
        train_parser.add_argument('--checkpoint-history', default=settings.DEFAULT_CHECKPOINT_HISTORY, type=int, help="How many autosaved checkpoints to retain (older ones are pruned); 0 disables autosaving")
        train_parser.add_argument('--init-weights', default=None, type=str, help="Warm-start the model from this .checkpoint/.weights file")
        train_parser.add_argument('--batch-size', default=settings.DEFAULT_BATCH_SIZE, type=int, help="Samples per device per step")
        train_parser.add_argument('--epochs', required=True, type=int, help="Total epochs to train for")
        train_parser.add_argument('--learning-rate', type=float, default=settings.DEFAULT_LEARNING_RATE, help="Initial SGD learning rate (poly-decayed per epoch)")
        train_parser.add_argument('--end-learning-rate', type=float, default=settings.DEFAULT_END_LEARNING_RATE, help="Learning rate floor reached at the final epoch")
        train_parser.add_argument('--momentum', type=float, default=settings.DEFAULT_MOMENTUM, help="SGD momentum coefficient")
        train_parser.add_argument('--weights-decay', type=float, default=settings.DEFAULT_WEIGHTS_DECAY, help="SGD weight decay (L2)")
        train_parser.add_argument('--poly-power', type=float, default=settings.DEFAULT_POLY_POWER, help="Exponent of the polynomial decay schedule")
        train_parser.add_argument('--stage', required=True, type=int, choices=settings.STAGES, help="Training stage: 1 = segmentation only, 2 = + super-resolution branch, 3 = + feature-affinity loss")
        train_parser.add_argument('--w1', type=float, default=settings.DEFAULT_LOSS_WEIGHTS[0], help="SISR MSE loss weight (stage >= 2)")
        train_parser.add_argument('--w2', type=float, default=settings.DEFAULT_LOSS_WEIGHTS[1], help="Feature-affinity loss weight (stage 3)")
        train_parser.add_argument('--freeze-batch-norm', action='store_true', help="Use running statistics in every BatchNorm during training (no stat updates)")
        train_parser.add_argument('--experiment-id', type=str, default='', help="Name for this run; weights/logs land under experiments/<id>/")
        train_parser.add_argument('--description', type=str, default=None, help="Free-text note recorded in the run's params.txt")
        train_parser.add_argument('--early-stopping', action='store_true', help="Stop the run once average training loss drops below average validation loss")
        train_parser.add_argument('--dry-run', action='store_true', help="Skip the network entirely (random outputs) to exercise the engine boilerplate")
        train_parser.add_argument('--debug-nans', action='store_true', help="Raise on the first NaN produced by any op (replaces the reference's per-step NaN asserts)")
        train_parser.add_argument('--yes', action='store_true', help="Assume 'yes' for interactive confirmations (non-interactive runs)")

        config_train_parser = command_parser.add_parser('config-train', help="Launch 'train' with options taken from a JSON config file")
        config_train_parser.add_argument('--file', required=True, type=str, help="JSON file whose keys/values become 'train' command-line options")

        resume_train_parser = command_parser.add_parser('resume-train', help="Continue an interrupted run from its autosaved checkpoint")
        resume_train_parser.add_argument('--checkpoint', required=True, type=str, help="The .checkpoint file to continue training from (hyperparameters come from it)")
        resume_train_parser.add_argument('--distributed', required=False, nargs=7, metavar=('MASTER_ADDR', 'MASTER_PORT', 'NODES', 'DEVICES_PER_NODE', 'BACKEND', 'INIT_METHOD', 'NODE_ID'), const=settings.SUPPORTED_DISTRIBUTED_BACKENDS, action=ValidateDistributedTrainingOptions, help="Multi-host training topology (reference DDP tuple; NODES/NODE_ID map to jax.distributed)")
        resume_train_parser.add_argument('--dataset', required=True, type=str.casefold, choices=settings.DATASETS.keys(), help="Registered dataset to train on")

        test_parser = command_parser.add_parser('test', help="Run inference and save colorized segmentation visualizations")
        test_source = test_parser.add_mutually_exclusive_group(required=True)
        test_source.add_argument('--image-file', type=str, help="Segment a single image file")
        test_source.add_argument('--images-dir', type=str, help="Segment every JPG/PNG in a directory")
        test_source.add_argument('--dataset', nargs=3, metavar=('DATASET', 'SPLIT', 'STARTING_INDEX'), const=settings.DATASETS, action=ValidateDatasetNameSplitAndIndex, help="Walk a dataset split, starting at the given index")
        test_parser.add_argument('--output-dir', type=str, default=settings.OUTPUTS_DIR, help="Where to write the visualization PNGs")
        test_parser.add_argument('--weights', required=True, type=str, help="Trained .checkpoint/.weights file (or compiled model with --compiled-model)")
        test_parser.add_argument('--device', default=settings.DEFAULT_DEVICE, type=str.casefold, choices=settings.SUPPORTED_DEVICES, help="Backend the model runs on (cpu or tpu)")
        test_parser.add_argument('--disable-cudnn-benchmark', action='store_true', help="Accepted for CLI compatibility; no-op on TPU")
        test_parser.add_argument('--profile', action='store_true', help="Enable JAX profiling")
        test_parser.add_argument('--compiled-model', action='store_true', help="Treat --weights as an AOT bundle produced by compile-model")
        test_parser.add_argument('--show', action='store_true', help="Open each visualization in the system image viewer after saving it")
        test_parser.add_argument('--no-interactive', action='store_true', help="In dataset mode, do not pause for ENTER between images")

        purge_weights_logs = command_parser.add_parser('purge-weights-logs', help="Delete saved weights and logs for one stage or all stages")
        purge_weights_logs_type = purge_weights_logs.add_mutually_exclusive_group(required=True)
        purge_weights_logs_type.add_argument('--stage', type=int, choices=settings.STAGES, help="Only purge this stage")
        purge_weights_logs_type.add_argument('--all', action='store_true', help="Purge every stage")
        purge_weights_logs.add_argument('--yes', action='store_true', help="Assume 'yes' for the confirmation prompt")

        print_model_parser = command_parser.add_parser('print-model', help="Show the model's layer table and parameter counts for a stage")
        print_model_parser.add_argument('--stage', required=True, type=int, choices=settings.STAGES, help="Stage whose subgraph is instantiated")
        print_model_parser.add_argument('--dataset', type=str.casefold, choices=settings.DATASETS.keys(), default=list(settings.DATASETS.keys())[0], help="Dataset whose class count/normalization settings apply")

        # Both the reference's misspelled public command name and the correct one.
        for prune_cmd in ['purne-weights', 'prune-weights']:
            prune_parser = command_parser.add_parser(prune_cmd, help="Strip training-only parameters (SISR/FA branches, optimizer state) for deployment")
            prune_parser.add_argument('--src-weights', required=True, type=str, help="Input .checkpoint/.weights file")
            prune_parser.add_argument('--dest-weights', required=True, type=str, help="Output inference .weights file")
            prune_parser.add_argument('--dataset', type=str.casefold, choices=settings.DATASETS.keys(), default=list(settings.DATASETS.keys())[0], help="Dataset whose class count/normalization settings apply")
            prune_parser.add_argument('--torch-format', action='store_true', help="Write a torch-zip .pth loadable by torch.load (interop export)")
            prune_parser.add_argument('--yes', action='store_true', help="Assume 'yes' for overwrite confirmation")

        inspect_checkpoint_parser = command_parser.add_parser('inspect-checkpoint', help="Print a checkpoint's hyperparameters and bookkeeping")
        inspect_checkpoint_parser.add_argument('--checkpoint', required=True, type=str, help="The .checkpoint file to inspect")

        edit_checkpoint_parser = command_parser.add_parser('edit-checkpoint', help="Overwrite one key in a checkpoint file")
        edit_checkpoint_parser.add_argument('--checkpoint', required=True, type=str, help="The .checkpoint file to modify")
        edit_checkpoint_parser.add_argument('--key', required=True, type=str, help="Checkpoint dictionary key to set")
        edit_checkpoint_parser.add_argument('--value', required=True, type=str, help="New value (parsed as --typeof)")
        edit_checkpoint_parser.add_argument('--typeof', required=True, type=str, help="Python type name the value is coerced to (str/int/float/bool)")

        benchmark_parser = command_parser.add_parser('benchmark', help="Evaluate weights over a dataset split (CE, mIoU, accuracy, throughput)")
        benchmark_parser.add_argument('--weights', required=True, type=str, help="Trained .checkpoint/.weights file")
        benchmark_parser.add_argument('--dataset', required=True, nargs=2, metavar=('DATASET', 'SPLIT'), action=ValidateDatasetNameAndSplit, const=settings.DATASETS, help="Dataset name and split to evaluate")
        benchmark_parser.add_argument('--device', default=settings.DEFAULT_DEVICE, type=str.casefold, choices=settings.SUPPORTED_DEVICES, help="Backend the model runs on (cpu or tpu)")
        benchmark_parser.add_argument('--disable-cudnn-benchmark', action='store_true', help="Accepted for CLI compatibility; no-op on TPU")
        benchmark_parser.add_argument('--num-workers', default=settings.DEFAULT_NUM_WORKERS, type=int, help="Host threads decoding input batches")
        benchmark_parser.add_argument('--batch-size', default=settings.DEFAULT_BATCH_SIZE, type=int, help="Samples per device per evaluation step")

        compile_model_parser = command_parser.add_parser('compile-model', help="Export the stage-1 model as a serialized StableHLO bundle for deployment")
        compile_model_parser.add_argument('--weights', required=True, type=str, help="Trained .checkpoint/.weights file")
        compile_model_parser.add_argument('--output-file', required=True, type=str, help="Where the compiled bundle is written")
        compile_model_parser.add_argument('--dataset', type=str.casefold, choices=settings.DATASETS.keys(), default=list(settings.DATASETS.keys())[0], help="Dataset whose class count/normalization settings apply")

        args = parser.parse_args(args)

        # ---- post-parse validation (parity: main.py:213-407) ----
        if args.command == 'train':
            if not args.num_workers >= 0:
                raise argparse.ArgumentTypeError("--num-workers must be >= 0.")
            if not args.val_interval > 0:
                raise argparse.ArgumentTypeError("--val-interval must be a positive number of epochs.")
            if not args.checkpoint_interval > 0:
                raise argparse.ArgumentTypeError("--checkpoint-interval must be a positive number of epochs.")
            if not args.checkpoint_history >= 0:
                raise argparse.ArgumentTypeError("--checkpoint-history must be >= 0 (0 disables autosaving).")
            if args.init_weights:
                if not any(hasExtension(args.init_weights, x) for x in ['.checkpoint', '.weights']):
                    raise argparse.ArgumentTypeError("--init-weights expects a .checkpoint or .weights file.")
                if not os.path.isfile(args.init_weights):
                    raise argparse.ArgumentTypeError("No such weights file: '{}'.".format(args.init_weights))
                args.init_weights = os.path.abspath(args.init_weights)
            if not args.batch_size > 0:
                raise argparse.ArgumentTypeError("--batch-size must be a positive integer.")
            if not args.epochs > 0:
                raise argparse.ArgumentTypeError("--epochs must be a positive integer.")
            if not args.learning_rate > 0.:
                raise argparse.ArgumentTypeError("--learning-rate must be > 0.")
            if not args.momentum > 0.:
                raise argparse.ArgumentTypeError("--momentum must be > 0.")
            if not args.weights_decay > 0.:
                raise argparse.ArgumentTypeError("--weights-decay must be > 0.")
            if not args.poly_power > 0.:
                raise argparse.ArgumentTypeError("--poly-power must be > 0.")
            if args.experiment_id:
                if isInvalidFilename(args.experiment_id):
                    raise argparse.ArgumentTypeError("--experiment-id may not contain any of: {}.".format(', '.join(INVALID_FILENAME_CHARS)))
                args.experiment_id = os.path.join(settings.EXPERIMENTS_ROOT_DIR, args.experiment_id)
                if os.path.isdir(args.experiment_id):
                    raise argparse.ArgumentTypeError("An experiment named '{}' already exists; pick a new id (experiment directories are never overwritten).".format(os.path.basename(args.experiment_id)))
            if os.path.isfile(os.path.join(args.experiment_id, settings.WEIGHTS_DIR.format(stage=args.stage), settings.FINAL_WEIGHTS_FILE)):
                answer = 'y' if args.yes else input(CAUTION("Weights file for this stage already exists. Training will delete the current weights and logs. Continue? (y/n) ")).casefold()
                if answer == 'y':
                    shutil.rmtree(os.path.join(args.experiment_id, settings.LOGS_DIR.format(stage=args.stage, mode='')), ignore_errors=True)
                    shutil.rmtree(os.path.join(args.experiment_id, settings.WEIGHTS_DIR.format(stage=args.stage)))
                else:
                    sys.exit(0)

        elif args.command == 'config-train':
            # Each top-level JSON key/value becomes a '--key value' pair of a
            # 'train' invocation, which runs in a child process so its exit
            # code (and any Ctrl+C handling) is isolated from this parser.
            if not os.path.isfile(args.file):
                raise argparse.ArgumentTypeError("No such config file: '{}'.".format(args.file))
            try:
                with open(args.file) as config_file:
                    config = json.load(config_file)
            except json.JSONDecodeError as ex:
                raise argparse.ArgumentTypeError("'{}' is not valid JSON: {}".format(args.file, ex))
            train_argv = ['train']
            for key, value in config.items():
                train_argv += ['--' + key, str(value)]
            train_process = multiprocessing.Process(target=parse_cmdline_and_invoke_main,
                                                    args=(train_argv,))
            try:
                train_process.start()
                train_process.join()
            except KeyboardInterrupt:
                sys.exit(0)
            sys.exit(train_process.exitcode)

        elif args.command == 'resume-train':
            if not hasExtension(args.checkpoint, '.checkpoint'):
                raise argparse.ArgumentTypeError("resume-train needs a full .checkpoint file (model + optimizer + engine state), not a .weights file.")
            if not os.path.isfile(args.checkpoint):
                raise argparse.ArgumentTypeError("No such checkpoint file: '{}'.".format(args.checkpoint))
            # Resume runs on the device the checkpoint was trained with (the
            # reference re-applies every checkpointed hyperparameter,
            # main.py:48-52); peek before the platform is selected below.
            try:
                args.device = load_checkpoint_or_weights(args.checkpoint).get(
                    'device', settings.DEFAULT_DEVICE)
            except Exception:
                pass

        elif args.command == 'test':
            if args.image_file and not os.path.isfile(args.image_file):
                raise argparse.ArgumentTypeError("No such image file: '{}'.".format(args.image_file))
            if args.images_dir and not os.path.isdir(args.images_dir):
                raise argparse.ArgumentTypeError("No such directory: '{}'.".format(args.images_dir))
            if not args.compiled_model and not any(hasExtension(args.weights, x) for x in ['.checkpoint', '.weights']):
                raise argparse.ArgumentTypeError("--weights expects a .checkpoint or .weights file.")
            if not os.path.isfile(args.weights):
                raise argparse.ArgumentTypeError("No such weights file: '{}'.".format(args.weights))

        elif args.command == 'purge-weights-logs':
            answer = 'y' if args.yes else input('This will delete {:s} logs and weights. Continue? (y/n) '.format('all' if args.all else 'stage {:d}'.format(args.stage))).casefold()
            if answer == 'y':
                purge_start_stage = settings.STAGES[0] if args.all else args.stage
                purge_stop_stage = settings.STAGES[-1] if args.all else args.stage
                for stage in range(purge_start_stage, purge_stop_stage + 1):
                    logs_dir = settings.LOGS_DIR.format(stage=stage, mode='')
                    weights_dir = settings.WEIGHTS_DIR.format(stage=stage)
                    for dir_ in [logs_dir, weights_dir]:
                        if os.path.isdir(dir_):
                            shutil.rmtree(dir_)
            sys.exit(0)

        elif args.command in ('purne-weights', 'prune-weights'):
            if not any(hasExtension(args.src_weights, x) for x in ['.checkpoint', '.weights']):
                raise argparse.ArgumentTypeError("--src-weights expects a .checkpoint or .weights file.")
            if not os.path.isfile(args.src_weights):
                raise argparse.ArgumentTypeError("No such weights file: '{}'.".format(args.src_weights))
            if os.path.isfile(args.dest_weights):
                answer = 'y' if args.yes else input(CAUTION("Destination weights file specified already exists. This will overwrite the file. Continue (y/n)? ")).casefold()
                if answer != 'y':
                    sys.exit(0)

        elif args.command in ('inspect-checkpoint', 'edit-checkpoint'):
            if not hasExtension(args.checkpoint, '.checkpoint'):
                raise argparse.ArgumentTypeError("--checkpoint expects a .checkpoint file.")
            if not os.path.isfile(args.checkpoint):
                raise argparse.ArgumentTypeError("No such checkpoint file: '{}'.".format(args.checkpoint))

        elif args.command == 'benchmark':
            if not any(hasExtension(args.weights, x) for x in ['.checkpoint', '.weights']):
                raise argparse.ArgumentTypeError("--weights expects a .checkpoint or .weights file.")
            if not os.path.isfile(args.weights):
                raise argparse.ArgumentTypeError("No such weights file: '{}'.".format(args.weights))
            if not args.num_workers >= 0:
                raise argparse.ArgumentTypeError("--num-workers must be >= 0.")
            if not args.batch_size > 0:
                raise argparse.ArgumentTypeError("--batch-size must be a positive integer.")

        elif args.command == 'compile-model':
            if not any(hasExtension(args.weights, x) for x in ['.checkpoint', '.weights']):
                raise argparse.ArgumentTypeError("--weights expects a .checkpoint or .weights file.")
            if not os.path.isfile(args.weights):
                raise argparse.ArgumentTypeError("No such weights file: '{}'.".format(args.weights))

        _select_platform(args)

        if getattr(args, 'profile', False):
            os.makedirs(settings.PROFILING_DIR, exist_ok=True)
            with jax.profiler.trace(settings.PROFILING_DIR):
                main(args.__dict__)
            print(INFO("Profiling output has been saved to '{:s}'.".format(settings.PROFILING_DIR)))
        else:
            main(args.__dict__)

    except KeyboardInterrupt:
        print(CAUTION("Caught 'Ctrl+c' SIGINT signal. Aborted operation."))

    except argparse.ArgumentTypeError as ex:
        print(FATAL("{:s}\n".format(str(ex))))
        if parser:
            parser.print_usage()


if __name__ == '__main__':
    parse_cmdline_and_invoke_main(sys.argv[1:])
