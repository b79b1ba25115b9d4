"""Reference-written checkpoint interop: torch SGD optimizer state.

The reference persists ``optimizer.state_dict()`` verbatim into its
``.checkpoint`` files (/root/reference/command_handlers/train_or_resume.py:
74-77, utils.py:270-282): id-keyed ``state`` entries with lazy
``momentum_buffer`` tensors plus ``param_groups``.  These tests write a full
36-key checkpoint with REAL ``torch.save`` from a real ``torch.optim.SGD``
driven over the torch replica model, then verify (a) the momentum pytree our
loader rebuilds is numerically identical to torch's buffers, and (b) the
``resume-train`` and ``--init-weights`` CLI paths run unchanged on it.
"""

import glob
import os

import numpy as np
import pytest
import torch as t
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu import settings
from dualsuperreslearningforsemseg_tpu.checkpoint import load_checkpoint_or_weights
from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.models.state_dict import (
    flatten_variables, _to_torch_name_and_array, load_state_dict)
from dualsuperreslearningforsemseg_tpu.train.optim import (
    sgd_init, load_optimizer_state_dict)
from tests.test_full_model_parity import LAYERS, TorchDSRL, _PREFIX_MAP


def _reference_names(replica_dict):
    """Rename the torch replica's short module names to the reference's
    (= our) names, preserving torch registration order."""
    out = {}
    for key, value in replica_dict.items():
        for ours, replica in _PREFIX_MAP:
            if key.startswith(replica):
                out[ours + key[len(replica):]] = value
                break
        else:
            raise AssertionError('unmapped replica key ' + key)
    return out


def _torch_trained_checkpoint(path, steps=2, epoch=1, epochs=2):
    """Train the torch replica for a couple of real SGD steps and torch.save
    the reference's full 36-key checkpoint layout."""
    t.manual_seed(0)
    ref = TorchDSRL(stage=3)
    opt = t.optim.SGD(ref.parameters(), lr=0.01, momentum=0.9, weight_decay=5e-4)
    for _ in range(steps):
        x = t.randn(2, 3, 64, 128)  # >=2: train-mode BN on the ASPP 1x1 pool branch
        loss = sum(o.float().pow(2).mean() for o in ref(x))
        opt.zero_grad()
        loss.backward()
        opt.step()
    ckpt = dict(
        device='cpu', mixed_precision=None, amp_state_dict=None,
        disable_cudnn_benchmark=False, num_workers=2, val_interval=1,
        checkpoint_interval=1, checkpoint_history=2, init_weights=None,
        batch_size=2, epochs=epochs, learning_rate=0.01,
        end_learning_rate=0.0001, momentum=0.9, weights_decay=5e-4,
        poly_power=0.9, stage=3, w1=0.1, w2=1.0, freeze_batch_norm=False,
        experiment_id='', description='torch interop fixture',
        early_stopping=False,
        CE_train_avg_loss=2.9, MSE_train_avg_loss=0.5, FA_train_avg_loss=0.1,
        Avg_train_loss=3.0, CE_val_avg_loss=3.0, MSE_val_avg_loss=0.6,
        FA_val_avg_loss=0.1, Avg_val_loss=3.1, epoch=epoch,
        best_validation_dict={'epoch': 1, 'best_miou_percent': 2.0, 'loss': 3.1},
        model_state_dict=_reference_names(ref.state_dict()),
        optimizer_state_dict=opt.state_dict(),
    )
    assert set(settings.VARIABLES_IN_CHECKPOINT) <= set(ckpt)
    t.save(ckpt, path)
    return ref, opt


def test_torch_sgd_state_loads_numerically(tmp_path):
    path = str(tmp_path / 'epoch1.checkpoint')
    ref, opt = _torch_trained_checkpoint(path)
    loaded = load_checkpoint_or_weights(path)  # torch-format auto-detect

    model = DSRL(stage=3, num_classes=19, backbone_layers=LAYERS)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.zeros((1, 64, 128, 3)), False)
    variables, _, _ = load_state_dict(variables, loaded['model_state_dict'],
                                      strict=True)
    template = sgd_init(variables['params'])
    momentum = load_optimizer_state_dict(
        template, loaded['optimizer_state_dict'],
        model_state_dict=loaded['model_state_dict'])

    # Every torch buffer must land on its named leaf, bit-for-bit.
    want = {name: entry['momentum_buffer'].numpy()
            for (name, _), entry in zip(ref.named_parameters(),
                                        map(opt.state_dict()['state'].get,
                                            opt.state_dict()['param_groups'][0]['params']))}
    want = _reference_names(want)
    got = dict(_to_torch_name_and_array(k, v)
               for k, v in flatten_variables({'params': momentum}).items())
    assert set(want) == set(got)
    checked = 0
    for name in want:
        np.testing.assert_array_equal(got[name], want[name], err_msg=name)
        checked += 1
    assert checked > 50  # the whole tree, not a spot check
    assert any(np.abs(v).max() > 0 for v in want.values())  # real momentum


def test_torch_sgd_state_without_model_dict_raises(tmp_path):
    path = str(tmp_path / 'epoch1.checkpoint')
    _torch_trained_checkpoint(path)
    loaded = load_checkpoint_or_weights(path)
    model = DSRL(stage=3, num_classes=19, backbone_layers=LAYERS)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.zeros((1, 64, 128, 3)), False)
    with pytest.raises(ValueError, match='model_state_dict'):
        load_optimizer_state_dict(sgd_init(variables['params']),
                                  loaded['optimizer_state_dict'])


def test_lazy_missing_state_entries_keep_zeros(tmp_path):
    """torch creates momentum buffers lazily; ids absent from ``state``
    (never-stepped params) must keep the template's zeros."""
    path = str(tmp_path / 'epoch1.checkpoint')
    ref, opt = _torch_trained_checkpoint(path)
    sd = opt.state_dict()
    dropped_id = sd['param_groups'][0]['params'][0]
    del sd['state'][dropped_id]
    loaded_msd = {k: v.numpy() for k, v in
                  _reference_names(ref.state_dict()).items()}
    model = DSRL(stage=3, num_classes=19, backbone_layers=LAYERS)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.zeros((1, 64, 128, 3)), False)
    momentum = load_optimizer_state_dict(sgd_init(variables['params']), sd,
                                         model_state_dict=loaded_msd)
    flat = dict(_to_torch_name_and_array(k, v)
                for k, v in flatten_variables({'params': momentum}).items())
    dropped_name = _reference_names(dict(ref.named_parameters())).keys()
    dropped_name = list(dropped_name)[0]
    assert np.abs(flat[dropped_name]).max() == 0


@pytest.fixture()
def workdir(tmp_path):
    from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree
    data_root = os.path.join(str(tmp_path), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=4, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=4, size_hw=(64, 128), seed=7)
    old = os.getcwd()
    os.chdir(str(tmp_path))
    yield str(tmp_path)
    os.chdir(old)


def test_resume_train_from_torch_checkpoint(workdir):
    """The north-star contract: a reference recipe resumes unchanged from a
    checkpoint the reference wrote."""
    import main as cli
    os.makedirs('weights/stage3/checkpoints', exist_ok=True)
    path = os.path.join('weights', 'stage3', 'checkpoints', 'epoch1.checkpoint')
    _torch_trained_checkpoint(path, epoch=1, epochs=2)
    cli.parse_cmdline_and_invoke_main(
        ['resume-train', '--checkpoint', path, '--dataset', 'cityscapes'])
    assert os.path.isfile(os.path.join('weights', 'stage3', 'final.weights'))
    # the resumed run continued from epoch 2 (one remaining epoch)
    stdout = open(os.path.join('logs', 'stage3', 'train', 'stdout.txt')).read()
    assert 'EPOCH 2/2' in stdout
    assert 'EPOCH 1/2' not in stdout


def test_init_weights_from_torch_checkpoint(workdir):
    import main as cli
    path = 'torch_init.checkpoint'
    _torch_trained_checkpoint(path)
    cli.parse_cmdline_and_invoke_main(
        ['train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '3',
         '--epochs', '1', '--batch-size', '1', '--init-weights', path,
         '--num-workers', '2', '--yes'])
    assert os.path.isfile(os.path.join('weights', 'stage3', 'final.weights'))
