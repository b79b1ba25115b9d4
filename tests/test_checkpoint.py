"""Checkpoint I/O tests: our container roundtrip and the torch .pth reader."""

import numpy as np
import pytest
import torch as t

from dualsuperreslearningforsemseg_tpu.checkpoint import (
    load_checkpoint_or_weights, save_checkpoint, save_weights, load_torch_pth)


def test_save_load_checkpoint_roundtrip(tmp_path, rng):
    state = {
        'epoch': 7,
        'learning_rate': 0.01,
        'description': None,
        'freeze_batch_norm': False,
        'best_validation_dict': {'epoch': 3, 'best_miou_percent': 41.5, 'loss': 0.3},
        'model_state_dict': {
            'conv.weight': rng.standard_normal((4, 3, 3, 3), dtype=np.float32),
            'bn.num_batches_tracked': np.int64(12),
        },
        'optimizer_state_dict': {'momentum_buffers': {'conv.weight': rng.standard_normal((4, 3, 3, 3), dtype=np.float32)}},
    }
    save_checkpoint(str(tmp_path), 'epoch7.checkpoint', **state)
    loaded = load_checkpoint_or_weights(str(tmp_path / 'epoch7.checkpoint'))

    assert loaded['epoch'] == 7
    assert loaded['description'] is None
    assert loaded['best_validation_dict']['best_miou_percent'] == 41.5
    np.testing.assert_array_equal(loaded['model_state_dict']['conv.weight'],
                                  state['model_state_dict']['conv.weight'])
    np.testing.assert_array_equal(
        loaded['optimizer_state_dict']['momentum_buffers']['conv.weight'],
        state['optimizer_state_dict']['momentum_buffers']['conv.weight'])


def test_save_weights_layout(tmp_path, rng):
    sd = {'w': rng.standard_normal((2, 2), dtype=np.float32)}
    save_weights(str(tmp_path), 'final.weights', sd, None)
    loaded = load_checkpoint_or_weights(str(tmp_path / 'final.weights'))
    assert set(loaded.keys()) == {'model_state_dict', 'mixed_precision', 'amp_state_dict'}
    assert loaded['mixed_precision'] is None
    np.testing.assert_array_equal(loaded['model_state_dict']['w'], sd['w'])


def test_torch_pth_reader_zip_format(tmp_path, rng):
    """Read a torch-zip .pth written by real torch without using torch to read."""
    sd = {
        'conv1.weight': t.randn(8, 3, 7, 7),
        'bn1.running_mean': t.randn(8),
        'bn1.num_batches_tracked': t.tensor(42, dtype=t.int64),
        'fc.weight': t.randn(10, 8),
    }
    path = tmp_path / 'zoo.pth'
    t.save(sd, str(path))  # new zipfile serialization

    loaded = load_torch_pth(str(path))
    assert set(loaded.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(loaded[k], sd[k].numpy(), rtol=0, atol=0)
    assert loaded['conv1.weight'].dtype == np.float32
    assert loaded['bn1.num_batches_tracked'].dtype == np.int64


def test_load_checkpoint_dispatches_to_torch_format(tmp_path):
    sd = {'x': t.ones(3)}
    path = tmp_path / 'model.pth'
    t.save(sd, str(path))
    loaded = load_checkpoint_or_weights(str(path))
    np.testing.assert_array_equal(loaded['x'], np.ones(3, np.float32))


def test_noncontiguous_tensor_in_pth(tmp_path):
    sd = {'w': t.randn(6, 4).t()}  # transposed view -> non-trivial strides
    path = tmp_path / 'nc.pth'
    t.save(sd, str(path))
    loaded = load_torch_pth(str(path))
    np.testing.assert_allclose(loaded['w'], sd['w'].numpy())


def test_save_torch_pth_roundtrip_with_real_torch(tmp_path, rng):
    """Our hand-written torch-zip writer must be loadable by real torch.load
    AND by our own reader."""
    from dualsuperreslearningforsemseg_tpu.checkpoint import save_torch_pth
    state = {
        'conv.weight': rng.standard_normal((4, 3, 3, 3), dtype=np.float32),
        'bn.running_mean': rng.standard_normal(4).astype(np.float64),
        'count': np.asarray(7, dtype=np.int64).reshape(()),
        'mask': rng.integers(0, 255, size=(5,)).astype(np.uint8),
    }
    path = str(tmp_path / 'exported.pth')
    save_torch_pth(state, path)

    via_torch = t.load(path, map_location='cpu', weights_only=True)
    assert set(via_torch.keys()) == set(state.keys())
    for k, v in state.items():
        np.testing.assert_array_equal(via_torch[k].numpy(), v)
    assert via_torch['conv.weight'].dtype == t.float32
    assert via_torch['count'].dtype == t.int64

    via_ours = load_torch_pth(path)
    for k, v in state.items():
        np.testing.assert_array_equal(np.asarray(via_ours[k]), v)


def test_torch_pth_rejects_arbitrary_globals(tmp_path):
    """.pth files are untrusted input (--weights/--init-weights paths route
    straight here): a crafted pickle resolving a non-torch global must be
    refused, never imported or called (checkpoint/torch_pth.py find_class)."""
    import io
    import pickle
    import pickletools
    import zipfile

    import pytest
    from dualsuperreslearningforsemseg_tpu.checkpoint.torch_pth import load_torch_pth

    evil = tmp_path / 'evil.pth'
    # torch-zip shaped container whose data.pkl GLOBALs os.system.
    payload = (b'\x80\x02cos\nsystem\nq\x00X\x04\x00\x00\x00trueq\x01\x85q\x02Rq\x03.')
    pickletools.dis(payload, out=io.StringIO())  # well-formed pickle
    with zipfile.ZipFile(evil, 'w') as zf:
        zf.writestr('archive/data.pkl', payload)
    with pytest.raises(pickle.UnpicklingError, match='refusing to resolve'):
        load_torch_pth(str(evil))


def test_torch_pth_numpy_scalars_allowed(tmp_path):
    """torch checkpoints legitimately carry numpy scalars/arrays (e.g. a
    best-mIoU from np.mean); the hardened unpickler must admit numpy's
    benign data-reconstruction globals while still rejecting everything
    else (test_torch_pth_rejects_arbitrary_globals)."""
    from dualsuperreslearningforsemseg_tpu.checkpoint.torch_pth import load_torch_pth
    p = str(tmp_path / 'np.pth')
    t.save({'w': t.arange(6, dtype=t.float32).reshape(2, 3),
            'best_miou': np.float64(61.2),
            'hist': np.arange(4)}, p)
    out = load_torch_pth(p)
    assert float(out['best_miou']) == 61.2
    np.testing.assert_array_equal(out['hist'], np.arange(4))
    np.testing.assert_array_equal(out['w'], np.arange(6, dtype=np.float32).reshape(2, 3))


def test_edit_checkpoint_unknown_typeof_names_the_string(tmp_path):
    """A mistyped --typeof must fail with a message naming the bad value,
    not an opaque NoneType-call error (pydoc.locate returns None)."""
    from dualsuperreslearningforsemseg_tpu.checkpoint import save_checkpoint
    from dualsuperreslearningforsemseg_tpu.commands.edit_checkpoint import (
        edit_checkpoint)
    save_checkpoint(str(tmp_path), 'x.checkpoint', epoch=3)
    ckpt = str(tmp_path / 'x.checkpoint')
    with pytest.raises(ValueError, match='no_such_type'):
        edit_checkpoint(ckpt, 'epoch', '5', 'no_such_type')
    edit_checkpoint(ckpt, 'epoch', '5', 'int')  # the happy path still works
