"""REAL multi-process data-parallel training through the CLI: two OS
processes rendezvous via ``jax.distributed`` on CPU (2 virtual devices each,
so a 4-device global mesh), run `train --distributed` end-to-end on a
synthetic Cityscapes tree, and must agree on the outcome.

This exercises the paths a single-process suite cannot: the --distributed
7-tuple translation at the CLI boundary, cross-process batch/mask assembly
(jax.make_array_from_process_local_data incl. the padded ragged validation
batch), collective validation on every rank with master-only I/O, and the
all-rank early-stop agreement.  Reference topology: one process per node,
/root/reference/main.py:19-43.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
try:
    from dualsuperreslearningforsemseg_tpu.utils.fsutil import compile_cache_dir
    jax.config.update('jax_compilation_cache_dir', compile_cache_dir('cpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:
    pass
import main as cli
port, node_id = sys.argv[1], sys.argv[2]
cli.parse_cmdline_and_invoke_main([
    'train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
    '--epochs', '2', '--batch-size', '1', '--val-interval', '1',
    '--checkpoint-interval', '1', '--checkpoint-history', '1',
    '--num-workers', '1', '--yes',
    '--distributed', '127.0.0.1', port, '2', '2', 'nccl', ' ', node_id,
])
"""


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train(tmp_path):
    from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree
    data_root = os.path.join(str(tmp_path), 'datasets', 'Cityscapes', 'data')
    # 6 val images with global batch 4 (2 processes x 2 devices x batch 1)
    # leaves a ragged final batch of 2 -> exercises the padded-mask path.
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=8, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=6, size_hw=(64, 128), seed=3)

    env = dict(os.environ)
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    env['XLA_FLAGS'] = ' '.join(flags + ['--xla_force_host_platform_device_count=2'])
    extra = [p for p in env.get('PYTHONPATH', '').split(os.pathsep) if p]
    env['PYTHONPATH'] = os.pathsep.join([REPO] + extra)
    env.setdefault('DSRL_TPU_MODEL_INPUT_SIZE', '64x128')
    env.setdefault('DSRL_TPU_BACKBONE_LAYERS', '1,1,2,1')

    port = str(_free_port())
    procs = [subprocess.Popen([sys.executable, '-c', _CHILD, port, str(node_id)],
                              env=env, cwd=str(tmp_path),
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for node_id in (0, 1)]
    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=900)
        outs.append(out)
    for node_id, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, \
            "node {} failed:\n{}".format(node_id, out[-4000:])

    # Master-only artifacts exist exactly once (written under the shared cwd).
    assert os.path.isfile(os.path.join(str(tmp_path), 'weights', 'stage1', 'final.weights'))
    assert os.path.isfile(os.path.join(str(tmp_path), 'logs', 'stage1', 'train', 'params.txt'))
    params = open(os.path.join(str(tmp_path), 'logs', 'stage1', 'train', 'params.txt')).read()
    assert 'Distributed' in params and '2 x cpu' in params

    # The master rank printed validation results over the global (padded)
    # batch; the non-master rank participated silently.
    assert 'Validation results' in outs[0]
    assert 'Validation results' not in outs[1]
    assert 'backend' in outs[0].casefold()  # the ignored-nccl CAUTION
