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
cli.parse_cmdline_and_invoke_main(sys.argv[1:])
"""


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run_two_processes(tmp_path, train_args, env_overrides=None, timeout=900):
    """Launch two CLI child processes that rendezvous over jax.distributed
    (2 virtual CPU devices each) and return ``(procs, outs)``."""
    env = dict(os.environ)
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    env['XLA_FLAGS'] = ' '.join(flags + ['--xla_force_host_platform_device_count=2'])
    extra = [p for p in env.get('PYTHONPATH', '').split(os.pathsep) if p]
    env['PYTHONPATH'] = os.pathsep.join([REPO] + extra)
    env.setdefault('DSRL_TPU_MODEL_INPUT_SIZE', '64x128')
    env.setdefault('DSRL_TPU_BACKBONE_LAYERS', '1,1,2,1')
    # Tripwire (train/packing.py): in a multi-process run the jitted
    # PackedTrainState unpack must never be dispatched — every distributed
    # CLI test runs with the assert armed.
    env.setdefault('DSRL_TPU_ASSERT_SPMD_UNPACK', '1')
    env.update(env_overrides or {})

    port = str(_free_port())
    procs = [subprocess.Popen(
                 [sys.executable, '-c', _CHILD] + train_args +
                 ['--distributed', '127.0.0.1', port, '2', '2', 'nccl', ' ',
                  str(node_id)],
                 env=env, cwd=str(tmp_path),
                 stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
             for node_id in (0, 1)]
    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=timeout)
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_distributed_train(tmp_path):
    from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree
    data_root = os.path.join(str(tmp_path), 'datasets', 'Cityscapes', 'data')
    # 6 val images with global batch 4 (2 processes x 2 devices x batch 1)
    # leaves a ragged final batch of 2 -> exercises the padded-mask path.
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=8, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=6, size_hw=(64, 128), seed=3)

    cache_dir = os.path.join(str(tmp_path), 'rawcache_shared')
    procs, outs = _run_two_processes(tmp_path, [
        'train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
        '--epochs', '2', '--batch-size', '1', '--val-interval', '1',
        '--checkpoint-interval', '1', '--checkpoint-history', '1',
        '--num-workers', '1', '--yes',
    ], env_overrides={'DSRL_TPU_RAW_CACHE': cache_dir})
    for node_id, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, \
            "node {} failed:\n{}".format(node_id, out[-4000:])

    # Multi-process raw-cache priming: each rank primes its own epoch-1
    # shard into the SHARED cache dir (atomic entry writes); the shards
    # partition the global permutation, and the 2-epoch run touches every
    # pair — so by run end the cache must cover both splits completely.
    from dualsuperreslearningforsemseg_tpu.data import RawPairCache, CityscapesDataset
    cache = RawPairCache(cache_dir, (64, 128))
    for split, expect in (('train', 8), ('val', 6)):
        ds = CityscapesDataset(data_root, split=split)
        assert len(ds) == expect
        for ip, sp in ds.pairs:
            assert cache.has(ip, sp), (split, ip)

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

    # Both step programs went through first-dispatch alignment on each rank
    # (AOT compile + barrier BEFORE the communicator-initializing first
    # execution, parallel/mesh.py::align_first_dispatch).
    for out in outs:
        assert "First dispatch of 'train-step-stage1' aligned across 2 processes" in out
        assert "First dispatch of 'eval-step-stage1' aligned across 2 processes" in out


def _param_digests(out):
    """Parse every ``PARAM_DIGEST rank=R epoch=E <hex>`` line to
    ``[(rank, epoch, hex)]`` (the DSRL_TPU_DEBUG_PARAM_DIGEST hook)."""
    import re
    return [(int(r), int(e), h) for r, e, h in re.findall(
        r"PARAM_DIGEST rank=(\d+) epoch=(\d+) ([0-9a-f]{64})", out)]


@pytest.mark.slow
def test_two_process_distributed_resume(tmp_path):
    """Resume is orthogonal to distribution (reference main.py:149-152):
    2-process train to an autosaved checkpoint, then 2-process
    ``resume-train`` from it, asserting epoch continuity, identical
    post-resume params across ranks (sha256 of the fetched host params),
    and that the master-only packed-state read rule survives the whole
    flow (the DSRL_TPU_ASSERT_SPMD_UNPACK tripwire is armed: any rank
    dispatching the jitted unpack dies)."""
    from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree
    data_root = os.path.join(str(tmp_path), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=8, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=4, size_hw=(64, 128), seed=3)

    digest_env = {'DSRL_TPU_DEBUG_PARAM_DIGEST': '1'}
    procs, outs = _run_two_processes(tmp_path, [
        'train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
        '--epochs', '2', '--batch-size', '1', '--val-interval', '2',
        '--checkpoint-interval', '1', '--checkpoint-history', '2',
        '--num-workers', '1', '--yes',
    ], env_overrides=digest_env)
    for node_id, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, \
            "node {} failed in the initial train:\n{}".format(node_id, out[-4000:])

    ckpt = os.path.join(str(tmp_path), 'weights', 'stage1', 'checkpoints',
                        'epoch1.checkpoint')
    assert os.path.isfile(ckpt), "expected the epoch-1 autosave to survive"
    final_weights = os.path.join(str(tmp_path), 'weights', 'stage1', 'final.weights')
    first_final_mtime = os.path.getmtime(final_weights)

    # Both ranks ended the first run with bit-identical params.
    d0, d1 = _param_digests(outs[0]), _param_digests(outs[1])
    assert len(d0) == 1 and len(d1) == 1
    assert d0[0][1:] == d1[0][1:], "train run diverged across ranks"

    procs, outs = _run_two_processes(tmp_path, [
        'resume-train', '--checkpoint', ckpt, '--dataset', 'cityscapes',
    ], env_overrides=digest_env)
    for node_id, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, \
            "node {} failed in resume-train:\n{}".format(node_id, out[-4000:])

    # Epoch continuity: the resumed run starts at epoch 2 of 2 and never
    # re-runs epoch 1.
    assert '=> EPOCH 2/2' in outs[0]
    assert '=> EPOCH 1/2' not in outs[0]

    # Identical post-resume params across ranks, reported via the
    # master-safe host read path on every rank.
    d0, d1 = _param_digests(outs[0]), _param_digests(outs[1])
    assert len(d0) == 1 and len(d1) == 1
    assert d0[0][1] == 2 and d1[0][1] == 2  # digest taken after epoch 2
    assert d0[0][2] == d1[0][2], "resume-train diverged across ranks"

    # Master-only artifacts: params.txt records the resume, final.weights
    # was re-exported by the resumed run.
    params = open(os.path.join(str(tmp_path), 'logs', 'stage1', 'train',
                               'params.txt')).read()
    assert 'Resuming checkpoint' in params
    assert os.path.getmtime(final_weights) > first_final_mtime


@pytest.mark.slow
def test_two_process_alignment_absorbs_compile_skew(tmp_path):
    """A 45 s first-compile skew on rank 1 must not kill the run.

    jit compiles lazily at the step's first execution, and that execution
    initializes the cross-process communicators under a hard ~30 s window —
    so whenever one rank hits the persistent compile cache and the other
    misses (minutes of skew on the real model), the fast rank times out and
    every surviving rank dies with a misleading connection reset.
    ``align_first_dispatch`` AOT-compiles on the real operands and holds all
    ranks at a barrier before the first execution;
    ``DSRL_TPU_INJECT_COMPILE_DELAY`` fault-injects exactly the hazard, above
    the window, between rank 1's compile and the barrier."""
    from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree
    data_root = os.path.join(str(tmp_path), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=4, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=2, size_hw=(64, 128), seed=3)

    procs, outs = _run_two_processes(tmp_path, [
        'train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
        '--epochs', '1', '--batch-size', '1', '--val-interval', '5',
        '--checkpoint-interval', '5', '--checkpoint-history', '1',
        '--num-workers', '1', '--yes',
    ], env_overrides={'DSRL_TPU_INJECT_COMPILE_DELAY': '1:45'})
    for node_id, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, \
            "node {} failed under 45 s compile skew:\n{}".format(node_id, out[-4000:])
    for out in outs:
        assert "First dispatch of 'train-step-stage1' aligned across 2 processes" in out
    assert os.path.isfile(os.path.join(str(tmp_path), 'weights', 'stage1', 'final.weights'))
