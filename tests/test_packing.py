"""Small-leaf packing (train/packing.py): the packed jit boundary must be
numerically invisible — identical params/losses to the plain pytree
boundary — and transparent to attribute readers (.params etc.)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.train import (sgd_init, make_train_step,
                                                     make_eval_step, TrainState)
from dualsuperreslearningforsemseg_tpu.train.packing import (
    LeafPacker, PackedTrainState)
from dualsuperreslearningforsemseg_tpu import settings


def _tiny_state(seed=0):
    model = DSRL(stage=1, num_classes=19)
    h, w = settings.MODEL_INPUT_SIZE
    variables = model.init({'params': jax.random.PRNGKey(seed),
                            'dropout': jax.random.PRNGKey(seed + 1)},
                           jnp.zeros((1, h, w, 3), jnp.float32), False)
    return model, variables


def test_pack_unpack_roundtrip():
    _, variables = _tiny_state()
    state = TrainState(variables['params'], variables['batch_stats'],
                       sgd_init(variables['params']))
    packer = LeafPacker(state)
    packed, bigs = packer.pack_state(state)
    # every small f32 leaf landed in the buffer; everything reconstructs
    rebuilt = packer.unpack(packed, bigs)
    flat_a, tree_a = jax.tree_util.tree_flatten(state)
    flat_b, tree_b = jax.tree_util.tree_flatten(rebuilt)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    n_small = sum(1 for m in packer.meta if m[0] == 'p')
    assert n_small > 50, 'expected the BN/bias population to be packed'


def test_packed_state_properties():
    _, variables = _tiny_state()
    state = TrainState(variables['params'], variables['batch_stats'],
                       sgd_init(variables['params']))
    packer = LeafPacker(state)
    packed, bigs = packer.pack_state(state)
    pstate = PackedTrainState(packed, bigs, packer)
    np.testing.assert_array_equal(
        np.asarray(pstate.params['SSSR_decoder']['cls_conv']['kernel']),
        np.asarray(state.params['SSSR_decoder']['cls_conv']['kernel']))
    assert jax.tree_util.tree_structure(pstate.batch_stats) == \
        jax.tree_util.tree_structure(state.batch_stats)


def test_host_unpack_matches_device(monkeypatch):
    """device_get_state(): one fetch + numpy slicing, NO jit dispatch — the
    master-only checkpoint read must not launch device computations on a
    multi-process mesh (the other ranks never join them)."""
    _, variables = _tiny_state()
    state = TrainState(variables['params'], variables['batch_stats'],
                       sgd_init(variables['params']))
    packer = LeafPacker(state)
    packed, bigs = packer.pack_state(state)
    pstate = PackedTrainState(packed, bigs, packer)
    monkeypatch.setattr(jax, 'jit',
                        lambda *a, **k: pytest.fail('host path must not jit'))
    host = pstate.device_get_state()
    flat_a, tree_a = jax.tree_util.tree_flatten(state)
    flat_b, tree_b = jax.tree_util.tree_flatten(host)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        assert isinstance(b, np.ndarray) and b.shape == a.shape
        np.testing.assert_array_equal(np.asarray(a), b)


def test_packed_step_matches_plain(monkeypatch):
    """3 steps packed vs 3 steps with DSRL_TPU_PACK_SMALL=0: identical."""
    model, variables = _tiny_state()
    h, w = settings.MODEL_INPUT_SIZE
    oh, ow = 2 * h, 2 * w
    rng = np.random.default_rng(0)
    img_lo = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
    img_hi = jnp.asarray(rng.standard_normal((2, oh, ow, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (2, oh, ow)), jnp.int32)

    def run(pack_env):
        monkeypatch.setenv('DSRL_TPU_PACK_SMALL', pack_env)
        step = make_train_step(model, stage=1, w1=0.1, w2=1.0, momentum=0.9,
                               weight_decay=0.0005, fused_tail=False)
        state = TrainState(variables['params'], variables['batch_stats'],
                           sgd_init(variables['params']))
        losses = None
        for i in range(3):
            state, losses = step(state, img_lo, img_hi, seg,
                                 jnp.float32(0.01), jax.random.PRNGKey(7 + i))
        return state, losses

    state_packed, losses_packed = run('1')
    state_plain, losses_plain = run('0')
    assert isinstance(state_packed, PackedTrainState)
    assert isinstance(state_plain, TrainState)
    np.testing.assert_allclose(float(losses_packed['Total']),
                               float(losses_plain['Total']), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state_packed.params, state_plain.params)


def test_eval_from_state_matches_direct():
    model, variables = _tiny_state()
    h, w = settings.MODEL_INPUT_SIZE
    oh, ow = 2 * h, 2 * w
    rng = np.random.default_rng(1)
    img_lo = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
    img_hi = jnp.asarray(rng.standard_normal((2, oh, ow, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 19, (2, oh, ow)), jnp.int32)
    mask = jnp.ones((2,), jnp.float32)

    state = TrainState(variables['params'], variables['batch_stats'],
                       sgd_init(variables['params']))
    packer = LeafPacker(state)
    packed, bigs = packer.pack_state(state)
    pstate = PackedTrainState(packed, bigs, packer)

    eval_step = make_eval_step(model, stage=1, w1=0.1, w2=1.0, num_classes=19)
    ref = eval_step(state.params, state.batch_stats, img_lo, img_hi, seg, mask)
    out_packed = eval_step.from_state(pstate, img_lo, img_hi, seg, mask)
    out_plain = eval_step.from_state(state, img_lo, img_hi, seg, mask)
    for a, b, c in zip(jax.tree_util.tree_leaves(ref),
                       jax.tree_util.tree_leaves(out_packed),
                       jax.tree_util.tree_leaves(out_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)
