"""Stage-cascade CLI tests (VERDICT r3 #1b and #6).

The reference's 3-stage recipe warm-starts stage N from stage N-1's
``final.weights`` with ``strict=False``
(/root/reference/command_handlers/train_or_resume.py:91-96).  These tests
drive the REAL CLI through the full cascade on the learnable synthetic world
(held-out val split) and assert:

* the quality progression the paper's recipe relies on — stage-3 val mIoU
  at least matches stage-1's best (the cascade trains longer on the same
  color->class task, so it must not regress);
* each hand-off consumes the previous stage's weights with ZERO
  unexpected-key drops — the only missing keys are the new stage's modules;
* resume-train mid-stage-3 keeps the best-val bookkeeping and the
  checkpoint-history pruning window working across the resume boundary
  (reference :264-290,317-335).
"""

import glob
import os
import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import main as cli
from dualsuperreslearningforsemseg_tpu import settings
from dualsuperreslearningforsemseg_tpu.checkpoint import load_checkpoint_or_weights
from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree
from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.models.state_dict import load_state_dict


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp('cli_cascade')
    data_root = os.path.join(str(wd), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=16, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=16, size_hw=(64, 128), seed=7)
    old = os.getcwd()
    os.chdir(str(wd))
    yield str(wd)
    os.chdir(old)


def run_cli(*args):
    cli.parse_cmdline_and_invoke_main(list(args))


def _best_miou(stage):
    stdout = open(os.path.join('logs', 'stage{}'.format(stage), 'train',
                               'stdout.txt')).read()
    rows = re.findall(r"Best mIoU % yet is ([0-9.]+) at epoch", stdout)
    assert rows, stdout
    return float(rows[-1]), stdout


def _check_handoff(next_stage, src_weights, allowed_missing):
    """Replicate the engine's strict=False warm start on the real artifact
    and pin the key consumption: nothing unexpected is dropped, and the only
    missing keys belong to the modules the next stage introduces."""
    weights = load_checkpoint_or_weights(src_weights)
    model = DSRL(stage=next_stage, num_classes=19)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.zeros((1, 64, 128, 3)), False)
    _, missing, unexpected = load_state_dict(
        variables, weights['model_state_dict'], strict=False)
    assert unexpected == [], unexpected
    bad = [m for m in missing if not m.startswith(allowed_missing)]
    assert not bad, bad
    assert missing, 'stage {} must introduce new modules'.format(next_stage)


def test_stage_cascade_quality_and_handoffs(workdir):
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '10', '--batch-size', '1', '--val-interval', '5',
            '--learning-rate', '0.1', '--checkpoint-interval', '50',
            '--num-workers', '2', '--yes')
    miou1, _ = _best_miou(1)

    _check_handoff(2, os.path.join('weights', 'stage1', 'final.weights'),
                   allowed_missing=('SISR_decoder.',))

    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '2',
            '--epochs', '4', '--batch-size', '1', '--val-interval', '4',
            '--learning-rate', '0.05', '--checkpoint-interval', '50',
            '--num-workers', '2', '--yes')
    _, stdout2 = _best_miou(2)
    assert 'weights file from previous stage was found' in stdout2

    _check_handoff(3, os.path.join('weights', 'stage2', 'final.weights'),
                   allowed_missing=('SSSR_feature_transformer.',
                                    'SISR_feature_transformer.'))

    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '3',
            '--epochs', '6', '--batch-size', '1', '--val-interval', '3',
            '--learning-rate', '0.05', '--checkpoint-interval', '50',
            '--num-workers', '2', '--yes')
    miou3, stdout3 = _best_miou(3)
    assert 'weights file from previous stage was found' in stdout3

    # The cascade's promise: further (warm-started) training must not lose
    # the segmentation quality stage 1 reached on the held-out split.
    assert miou3 >= miou1, (miou1, miou3)


def test_cascade_resume_midstage3_bestval_and_pruning(workdir):
    """resume-train mid-stage-3 with a best-val checkpoint already on disk:
    the history window keeps pruning correctly across the boundary (the
    resumed epochs delete epochs saved BEFORE the resume) and exactly one
    rolling bestval checkpoint survives."""
    exp = 'resume_mid3'
    ckpt_dir = os.path.join('experiments', exp, 'weights', 'stage3', 'checkpoints')
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '3',
            '--epochs', '5', '--batch-size', '1', '--val-interval', '1',
            '--learning-rate', '0.05', '--checkpoint-interval', '1',
            '--checkpoint-history', '5', '--experiment-id', exp,
            '--num-workers', '2', '--yes')
    plain = sorted(os.path.basename(c) for c in
                   glob.glob(os.path.join(ckpt_dir, 'epoch*.checkpoint'))
                   if 'bestval' not in c)
    assert plain == ['epoch{}.checkpoint'.format(e) for e in (1, 2, 3, 4, 5)], plain
    bestvals = glob.glob(os.path.join(ckpt_dir, '*_bestval.checkpoint'))
    assert len(bestvals) == 1, bestvals

    # Extend the run via the CLI's own edit-checkpoint, then resume from
    # epoch 3 with a TIGHTER history window (2): epochs 4..7 re-save, and
    # the pruning must reach back across the boundary and delete epoch3/4/5
    # saved before the resume.
    mid = os.path.join(ckpt_dir, 'epoch3.checkpoint')
    run_cli('edit-checkpoint', '--checkpoint', mid, '--key', 'epochs',
            '--value', '7', '--typeof', 'int')
    run_cli('edit-checkpoint', '--checkpoint', mid, '--key',
            'checkpoint_history', '--value', '2', '--typeof', 'int')
    run_cli('resume-train', '--checkpoint', mid, '--dataset', 'cityscapes')

    stdout = open(os.path.join('experiments', exp, 'logs', 'stage3', 'train',
                               'stdout.txt')).read()
    assert 'EPOCH 4/7' in stdout and 'EPOCH 7/7' in stdout
    assert 'EPOCH 3/7' not in stdout  # resumed AFTER the checkpointed epoch

    plain = sorted(os.path.basename(c) for c in
                   glob.glob(os.path.join(ckpt_dir, 'epoch*.checkpoint'))
                   if 'bestval' not in c)
    # The window deletes exactly epoch-history each autosave (reference
    # :284-290 semantics): resumed epochs 4..7 delete 2,3,4,5 — including
    # epochs saved BEFORE the resume; epoch1 predates every window and
    # survives, as it does in the reference.
    assert plain == ['epoch1.checkpoint', 'epoch6.checkpoint',
                     'epoch7.checkpoint'], plain

    bestvals = glob.glob(os.path.join(ckpt_dir, '*_bestval.checkpoint'))
    assert len(bestvals) == 1, bestvals
    best = load_checkpoint_or_weights(bestvals[0])
    tag = int(re.match(r'epoch(\d+)_bestval', os.path.basename(bestvals[0])).group(1))
    assert best['best_validation_dict']['epoch'] == tag
    # the resumed run carried the bookkeeping forward: the rolling best is
    # the best over BOTH segments, and the val prints kept climbing from the
    # checkpointed best rather than resetting to 0
    first_resumed_best = float(re.findall(r"Best mIoU % yet is ([0-9.]+) at epoch",
                                          stdout)[0])
    assert first_resumed_best > 0.0
    assert os.path.isfile(os.path.join('experiments', exp, 'weights', 'stage3',
                                       'final.weights'))
