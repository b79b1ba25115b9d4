"""End-to-end tests of the pretrained ResNet101 zoo import.

``initialize_with_pretrained_weights`` is the reference's only pretrained
init and the largest single lever on final mIoU
(/root/reference/models/modules/backbone/ResNet101.py:58-65, README.md:8).
A wrong key prefix, a missed HWIO transpose, or an over-broad ``fc.`` filter
would silently train from Kaiming init — so these tests torch.save() a real
torchvision-named resnet101 state dict (genuine torch zip format, exercising
our .pth reader too) and assert:

  (a) every backbone tensor is consumed bit-for-bit (transpose round trip),
  (b) backbone features equal a torch replica loaded with the same weights,
  (c) the air-gapped CAUTION path leaves the Kaiming init untouched,
  (d) an incomplete zoo dict trips the BUG CHECK assert.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch as t

from dualsuperreslearningforsemseg_tpu.models import DSRL, ResNet101, state_dict
from dualsuperreslearningforsemseg_tpu.commands.train_or_resume import (
    initialize_with_pretrained_weights)
from tests.test_full_model_parity import TorchBackbone, LAYERS


def _init_dsrl_variables():
    model = DSRL(stage=1, num_classes=19, backbone_layers=LAYERS)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    return model.init({'params': jax.random.PRNGKey(0),
                       'dropout': jax.random.PRNGKey(1)}, x, False)


def _make_zoo_state_dict(variables, rng):
    """A torchvision-named resnet101 state dict with random (asymmetric)
    tensors in torch OIHW layout — shapes taken from our backbone so a layout
    or naming bug cannot cancel out."""
    prefix = 'feature_extractor.backbone.'
    zoo = {}
    for key, value in state_dict(variables).items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        if name.endswith('num_batches_tracked'):
            zoo[name] = np.asarray(7, np.int64)
        elif name.endswith('running_var'):
            zoo[name] = (0.5 + rng.random(value.shape)).astype(np.float32)
        else:
            # Small magnitudes keep the deep net's activations O(1) so the
            # f32 parity comparison is meaningful; still asymmetric enough
            # that a missed OIHW->HWIO transpose cannot cancel out.
            zoo[name] = (0.1 * rng.standard_normal(value.shape)).astype(np.float32)
    # torchvision's classifier head, which the import must filter out.
    zoo['fc.weight'] = rng.standard_normal((1000, 2048)).astype(np.float32)
    zoo['fc.bias'] = rng.standard_normal((1000,)).astype(np.float32)
    return zoo


def _save_zoo(zoo, weights_dir):
    os.makedirs(weights_dir, exist_ok=True)
    path = os.path.join(weights_dir, 'resnet101_pretrained.pth')
    # t.tensor (not from_numpy+ascontiguousarray) keeps num_batches_tracked
    # 0-dim, like the real torchvision zoo file.
    t.save({k: t.tensor(v) for k, v in zoo.items()}, path)
    return path


def test_zoo_import_consumes_all_backbone_keys(tmp_path, rng):
    variables = _init_dsrl_variables()
    zoo = _make_zoo_state_dict(variables, rng)
    weights_dir = str(tmp_path / 'weights')
    _save_zoo(zoo, weights_dir)

    new_vars, loaded = initialize_with_pretrained_weights(variables, weights_dir)
    assert loaded is True

    got = state_dict(new_vars)
    for name, want in zoo.items():
        if name.startswith('fc.'):
            assert 'feature_extractor.backbone.' + name not in got
            continue
        np.testing.assert_array_equal(
            got['feature_extractor.backbone.' + name], want,
            err_msg='zoo tensor {} not imported exactly'.format(name))


def test_zoo_import_feature_parity_with_torch(tmp_path, rng):
    variables = _init_dsrl_variables()
    zoo = _make_zoo_state_dict(variables, rng)
    weights_dir = str(tmp_path / 'weights')
    _save_zoo(zoo, weights_dir)
    new_vars, loaded = initialize_with_pretrained_weights(variables, weights_dir)
    assert loaded

    backbone_vars = {
        'params': new_vars['params']['feature_extractor']['backbone'],
        'batch_stats': new_vars['batch_stats']['feature_extractor']['backbone'],
    }
    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32) * 0.1
    ours_hi, ours_low = ResNet101(layers=LAYERS).apply(
        backbone_vars, jnp.asarray(x), False)

    ref = TorchBackbone().eval()
    missing, unexpected = ref.load_state_dict(
        {k: t.from_numpy(np.ascontiguousarray(v)) for k, v in zoo.items()
         if not k.startswith('fc.') and not k.endswith('num_batches_tracked')},
        strict=False)
    assert not missing, missing
    with t.no_grad():
        theirs_hi, theirs_low = ref(t.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))))
    np.testing.assert_allclose(np.asarray(ours_hi),
                               np.transpose(theirs_hi.numpy(), (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ours_low),
                               np.transpose(theirs_low.numpy(), (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)


def test_zoo_import_airgapped_keeps_kaiming_init(tmp_path, monkeypatch):
    variables = _init_dsrl_variables()
    weights_dir = str(tmp_path / 'weights')  # no .pth present

    def refuse(*args, **kwargs):
        raise OSError("network unreachable")
    import urllib.request
    monkeypatch.setattr(urllib.request, 'urlretrieve', refuse)

    before = state_dict(variables)
    new_vars, loaded = initialize_with_pretrained_weights(variables, weights_dir)
    assert loaded is False
    after = state_dict(new_vars)
    assert set(before) == set(after)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])


def test_zoo_import_missing_backbone_key_asserts(tmp_path, rng):
    variables = _init_dsrl_variables()
    zoo = _make_zoo_state_dict(variables, rng)
    del zoo['layer1.0.conv1.weight']
    weights_dir = str(tmp_path / 'weights')
    _save_zoo(zoo, weights_dir)
    with pytest.raises(AssertionError, match='missing keys'):
        initialize_with_pretrained_weights(variables, weights_dir)
