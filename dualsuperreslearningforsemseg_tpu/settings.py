"""Global framework settings.

Mirrors the configuration surface of the reference's ``settings.py``
(/root/reference/settings.py:11-80) with TPU-native substitutions:

* devices are ``cpu`` / ``tpu`` (``gpu`` is accepted as a compatibility alias
  for ``tpu`` — the reference only knew cpu/gpu, /root/reference/settings.py:23);
* mixed precision is bf16 compute with f32 parameters — the apex opt-level
  strings O0..O3 are accepted for CLI compatibility and mapped onto
  {None, 'bf16'} (/root/reference/settings.py:28);
* the distributed backend choice (gloo/mpi/nccl,
  /root/reference/settings.py:24) is accepted and ignored with a warning:
  XLA owns the TPU fabric (ICI/DCN collectives).
"""

import os.path
import collections

version_tuple = collections.namedtuple("Row", ["major", "minor"])
MIN_PYTHON_VERSION = version_tuple(major=3, minor=10)
MIN_JAX_VERSION = version_tuple(major=0, minor=4)
MIN_NUMPY_VERSION = version_tuple(major=1, minor=24)

# Compute defaults
DEFAULT_DTYPE = 'float32'
SUPPORTED_DEVICES = ['cpu', 'tpu', 'gpu']   # 'gpu' kept as an alias of 'tpu' for CLI parity
SUPPORTED_DISTRIBUTED_BACKENDS = ['gloo', 'mpi', 'nccl', 'xla']  # accepted; XLA is always used
RANDOM_SEED = 54321                         # parity: /root/reference/settings.py:25

# Mixed precision options: apex opt-levels accepted for CLI parity
# (/root/reference/settings.py:28); any of O1/O2/O3 -> bf16 compute.
AMP_OPTIMIZATION_OPTIONS = [None, 'O0', 'O1', 'O2', 'O3', 'BF16']

# Default values for commandline arguments (/root/reference/settings.py:30-43)
DEFAULT_DEVICE = 'tpu'
DEFAULT_AMP_OPTIMIZATION_OPTION = AMP_OPTIMIZATION_OPTIONS[0]
# The reference's fixed 4 DataLoader workers underfeed a v5e chip (the host
# decode+warp plane must sustain >200 img/s); scale with the host, capped.
# Never exceed the core count: the decode jobs are CPU-bound C++ (not
# blocking I/O), and oversubscribing a small host measurably halves
# throughput (1-core VM: 4 workers 7.6 img/s vs 1 worker 15.4).
DEFAULT_NUM_WORKERS = max(1, min(16, os.cpu_count() or 4))
DEFAULT_VAL_INTERVAL = 10
DEFAULT_CHECKPOINT_INTERVAL = 5
DEFAULT_CHECKPOINT_HISTORY = 5
DEFAULT_BATCH_SIZE = 4
DEFAULT_LEARNING_RATE = 0.01
DEFAULT_END_LEARNING_RATE = 0.001
DEFAULT_MOMENTUM = 0.9
DEFAULT_WEIGHTS_DECAY = 0.0005
DEFAULT_POLY_POWER = 0.9
DEFAULT_LOSS_WEIGHTS = [0.1, 1.0]

# Formats, directories and files (/root/reference/settings.py:45-58)
PROGRESSBAR_FORMAT = '{desc}: {percentage:.1f}%|{bar}| {n_fmt}/{total_fmt} [{elapsed}<{remaining} {postfix}'
EXPERIMENTS_ROOT_DIR = 'experiments'
WEIGHTS_ROOT_DIR = 'weights'
WEIGHTS_DIR = os.path.join(WEIGHTS_ROOT_DIR, 'stage{stage}')
FINAL_WEIGHTS_FILE = 'final.weights'
CHECKPOINTS_DIR = os.path.join(WEIGHTS_DIR, 'checkpoints')
CHECKPOINT_FILE = 'epoch{epoch}.checkpoint'
LOGS_DIR = os.path.join('logs', 'stage{stage}', '{mode}')
PARAMS_FILE = 'params.txt'
STDOUT_FILE = 'stdout.txt'
OUTPUTS_DIR = 'outputs'
PROFILING_FILE = 'profiling.json'
PROFILING_DIR = os.path.join(OUTPUTS_DIR, 'profile')
DATASETS_DIR = 'datasets'

# Model parameters (/root/reference/settings.py:60-63).  The env override
# exists for tests/smoke runs on tiny inputs (H and W must be multiples of 16).
STAGES = [1, 2, 3]
import os as _os  # noqa: E402
_size_env = _os.environ.get('DSRL_TPU_MODEL_INPUT_SIZE')
if _size_env:
    MODEL_INPUT_SIZE = tuple(int(x) for x in _size_env.lower().split('x'))
else:
    MODEL_INPUT_SIZE = (256, 512)
MODEL_OUTPUT_SIZE = tuple(x * 2 for x in MODEL_INPUT_SIZE)

# Backbone depth (ResNet-101 = 3,4,23,3).  Env override shrinks the backbone
# for CI/smoke runs (structurally identical, far faster to compile on CPU).
_layers_env = _os.environ.get('DSRL_TPU_BACKBONE_LAYERS')
BACKBONE_LAYERS = tuple(int(x) for x in _layers_env.split(',')) if _layers_env \
    else (3, 4, 23, 3)

# Backbone rematerialization (perf knob, parameter-tree neutral):
#   0 = off, 1 = recompute elementwise in the backward (conv outputs saved,
#   jax dots_saveable policy), 2 = full block remat (save block boundaries
#   only).  The backbone traced HBM-bandwidth-bound at 828 GB/s with the
#   MXU at 56% (round-3 xplane breakdown), so trading idle FLOPs for
#   activation traffic is the indicated direction — measure per hardware.
BACKBONE_REMAT = int(_os.environ.get('DSRL_TPU_BACKBONE_REMAT', '0'))

# Spatial sharding (parallel/mesh.py::make_mesh): number of mesh columns the
# image HEIGHT is sharded over (1 = pure data parallelism).  Must divide the
# device count; GSPMD inserts the conv halo exchanges, so any value is
# semantically exact.  Use when one sample's full-res decoder activations
# exceed a chip, or to scale a single sample across chips.
SPATIAL_SHARDS = int(_os.environ.get('DSRL_TPU_SPATIAL_SHARDS', '1'))

# Dataset registry (/root/reference/settings.py:65-74).  The 'class' entry is a
# factory (root, split, synthetic=False) -> data.reader dataset object.
def _cityscapes_factory(path, split, transforms=None):
    from .data.reader import CityscapesDataset
    return CityscapesDataset(path, split=split, transforms=transforms)

from .datasets import cityscapes as _cityscapes_settings  # noqa: E402

DATASETS = {
    'cityscapes': {
        'path': os.path.join(DATASETS_DIR, 'Cityscapes', 'data'),
        'splits': ['train', 'val', 'test'],
        'class': _cityscapes_factory,
        'settings': _cityscapes_settings,
    },
}
DATASETS = {k.casefold(): v for k, v in DATASETS.items()}

# Checkpoint schema: exact parity with /root/reference/settings.py:76-80.
VARIABLES_IN_CHECKPOINT = \
['device', 'mixed_precision', 'amp_state_dict', 'disable_cudnn_benchmark', 'num_workers', 'val_interval', 'checkpoint_interval', 'checkpoint_history', 'init_weights',
 'batch_size', 'epochs', 'learning_rate', 'end_learning_rate', 'momentum', 'weights_decay', 'poly_power', 'stage', 'w1', 'w2', 'freeze_batch_norm', 'experiment_id',
 'description', 'early_stopping', 'CE_train_avg_loss', 'MSE_train_avg_loss', 'FA_train_avg_loss', 'Avg_train_loss', 'CE_val_avg_loss', 'MSE_val_avg_loss',
 'FA_val_avg_loss', 'Avg_val_loss', 'epoch', 'best_validation_dict', 'model_state_dict', 'optimizer_state_dict', 'amp_state_dict']


def resolve_device(device: str) -> str:
    """Map a user-facing device string onto a JAX platform name."""
    device = device.casefold()
    if device == 'gpu':          # compatibility alias: reference used 'gpu' for its accelerator
        return 'tpu'
    return device


def mixed_precision_to_dtype(mixed_precision):
    """Map a mixed-precision option onto the compute dtype.

    apex opt-levels (reference /root/reference/settings.py:28) map as:
    None/'O0' -> float32; 'O1'/'O2'/'O3'/'BF16' -> bfloat16.  On TPU, bf16
    needs no loss scaling, so the amp state dict is always None.
    """
    if mixed_precision in (None, 'O0'):
        return 'float32'
    return 'bfloat16'
