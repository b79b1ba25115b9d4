"""DSRL model tests: shapes, stage gating, state-dict naming, init recipe."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualsuperreslearningforsemseg_tpu.models import DSRL, state_dict, load_state_dict, count_params

# Small input keeps CPU tests fast: H,W must be divisible by 16 (backbone
# output stride) and the FA path pools the stride-8 transform by 8.
TINY_HW = (64, 128)


def _init_model(stage, train=False, layers=None):
    model = DSRL(stage=stage, num_classes=19, backbone_layers=layers)
    x = jnp.zeros((1, *TINY_HW, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
                           x, train)
    return model, variables, x


@pytest.mark.parametrize("stage", [1, 2, 3])
def test_forward_shapes_by_stage(stage):
    model, variables, x = _init_model(stage)
    sssr, sisr, sssr_t, sisr_t = model.apply(variables, x, False)
    h, w = TINY_HW
    assert sssr.shape == (1, 2 * h, 2 * w, 19)
    if stage > 1:
        assert sisr.shape == (1, 2 * h, 2 * w, 3)
    else:
        assert sisr is None and sssr_t is None and sisr_t is None
    if stage > 2:
        assert sssr_t.shape == (1, 2 * h // 8, 2 * w // 8, 1)
        assert sisr_t.shape == (1, 2 * h // 8, 2 * w // 8, 1)


def test_state_dict_names_match_torch_layout():
    _, variables, _ = _init_model(3, layers=(3, 4, 23, 3))
    sd = state_dict(variables)
    expected = [
        'feature_extractor.backbone.conv1.weight',
        'feature_extractor.backbone.bn1.weight',
        'feature_extractor.backbone.bn1.running_mean',
        'feature_extractor.backbone.layer1.0.conv1.weight',
        'feature_extractor.backbone.layer1.0.downsample.0.weight',
        'feature_extractor.backbone.layer1.0.downsample.1.running_var',
        'feature_extractor.backbone.layer4.2.bn3.num_batches_tracked',
        'feature_extractor.aspp.branches.0.0.weight',
        'feature_extractor.aspp.branches.5.1.bias',
        'feature_extractor.shortcut_conv.0.weight',
        'feature_extractor.shortcut_conv.1.running_mean',
        'SSSR_decoder.cat_conv.0.weight',
        'SSSR_decoder.cat_conv.5.bias',
        'SSSR_decoder.cls_conv.weight',
        'SSSR_decoder.cls_conv.bias',
        'SSSR_decoder.upsample16_pred.2.weight',
        'SSSR_decoder.upsample16_pred.3.running_var',
        'SSSR_decoder.upsample16_pred.6.weight',
        'SSSR_decoder.upsample16_pred.6.bias',
        'SISR_decoder.0.weight',
        'SISR_decoder.0.bias',
        'SSSR_feature_transformer.0.weight',
        'SSSR_feature_transformer.1.weight',
        'SISR_feature_transformer.0.weight',
    ]
    for key in expected:
        assert key in sd, f"missing state-dict key: {key}"
    # torch conv layout: OIHW
    assert sd['feature_extractor.backbone.conv1.weight'].shape == (64, 3, 7, 7)
    assert sd['SSSR_decoder.upsample16_pred.2.weight'].shape == (19, 19, 2, 2)
    assert sd['SISR_decoder.0.weight'].shape == (3 * 64, 304, 3, 3)
    # ResNet101 depth check: layer3 has 23 blocks
    assert 'feature_extractor.backbone.layer3.22.conv3.weight' in sd
    assert 'feature_extractor.backbone.layer3.23.conv1.weight' not in sd


def test_param_count_matches_reference_scale():
    """Reference stage-1 DSRL is ResNet101 (42.5M) + ASPP + decoder; total
    should land in the 59-66M range (sanity envelope, not exact)."""
    _, variables, _ = _init_model(1, layers=(3, 4, 23, 3))
    trainable, total = count_params(variables)
    assert trainable == total
    assert 55e6 < trainable < 70e6, trainable


def test_state_dict_roundtrip():
    _, variables, x = _init_model(2)
    sd = state_dict(variables)
    # perturb all weights then load back the originals -> outputs identical
    model = DSRL(stage=2, num_classes=19)
    out0 = model.apply(variables, x, False)[0]
    new_vars, missing, unexpected = load_state_dict(variables, sd, strict=True)
    assert not missing and not unexpected
    out1 = model.apply(new_vars, x, False)[0]
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_stage_cascade_partial_load():
    """Stage-3 model must absorb stage-2 weights with strict=False, leaving
    the FA transformers at their init (reference train_or_resume.py:96)."""
    _, v2, _ = _init_model(2)
    _, v3, x = _init_model(3)
    sd2 = state_dict(v2)
    v3_new, missing, unexpected = load_state_dict(v3, sd2, strict=False)
    assert not unexpected
    assert all(('feature_transformer' in k) for k in missing), missing[:5]
    model = DSRL(stage=3, num_classes=19)
    out = model.apply(v3_new, x, False)
    assert out[0].shape[-1] == 19


def test_bn3_zero_init_makes_blocks_identity():
    _, variables, _ = _init_model(1)
    sd = state_dict(variables)
    np.testing.assert_array_equal(sd['feature_extractor.backbone.layer1.0.bn3.weight'], 0.0)
    np.testing.assert_array_equal(sd['feature_extractor.backbone.bn1.weight'], 1.0)


def test_train_mode_updates_batch_stats():
    model, variables, x = _init_model(1)
    out, mutated = model.apply(variables, jnp.ones_like(x), True,
                               rngs={'dropout': jax.random.PRNGKey(2)},
                               mutable=['batch_stats'])
    before = variables['batch_stats']['feature_extractor']['backbone']['bn1']['num_batches_tracked']
    after = mutated['batch_stats']['feature_extractor']['backbone']['bn1']['num_batches_tracked']
    assert int(after) == int(before) + 1
    rm_after = mutated['batch_stats']['feature_extractor']['backbone']['bn1']['running_mean']
    assert not np.allclose(np.asarray(rm_after), 0.0)


def test_bf16_forward_finite():
    model = DSRL(stage=3, num_classes=19, dtype=jnp.bfloat16)
    x = jnp.zeros((1, *TINY_HW, 3), jnp.bfloat16)
    variables = model.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}, x, False)
    outs = model.apply(variables, x, False)
    assert outs[0].dtype == jnp.bfloat16
    assert bool(jnp.isfinite(outs[0].astype(jnp.float32)).all())



def test_fast_dropout_pad_lanes_lockstep(rng):
    """FastDropout(pad_lanes=blk) on a natural (..., G, C) tensor must
    realize the SAME mask its channel-padded-columns twin draws at physical
    shape (..., G*blk) — the invariant that keeps the XLA reference tail in
    dropout lockstep with the cols-layout fused-tail carry
    (models/norm.py, models/dsrl.py)."""
    from dualsuperreslearningforsemseg_tpu.models.norm import FastDropout
    from dualsuperreslearningforsemseg_tpu.ops.conv import TAIL_COL_BLOCK

    g, c, blk = 4, 19, TAIL_COL_BLOCK
    x_nat = jnp.asarray(rng.standard_normal((2, 3, 5, g, c)), jnp.float32)
    x_cols = jnp.pad(x_nat, ((0, 0),) * 4 + ((0, blk - c),)).reshape(2, 3, 5, g * blk)

    drop = FastDropout(0.2)
    key = {'dropout': jax.random.PRNGKey(42)}
    y_nat = drop.apply({}, x_nat, False, pad_lanes=blk, rngs=key)
    y_cols = drop.apply({}, x_cols, False, rngs=key)
    y_cols_nat = y_cols.reshape(2, 3, 5, g, blk)[..., :c]
    np.testing.assert_array_equal(np.asarray(y_nat), np.asarray(y_cols_nat))


@pytest.mark.parametrize('mode', [1, 2])
def test_backbone_remat_is_numerically_identical(rng, mode):
    """settings.BACKBONE_REMAT is a pure perf knob: same param tree, same
    forward values, same gradients (models/resnet.py wraps Bottleneck in
    nn.remat; the ops are merely re-executed in the backward)."""
    from dualsuperreslearningforsemseg_tpu import settings
    from dualsuperreslearningforsemseg_tpu.models.resnet import ResNet101

    x = jnp.asarray(rng.standard_normal((2, 64, 128, 3)), jnp.float32)

    def run(m):
        old = settings.BACKBONE_REMAT
        settings.BACKBONE_REMAT = m
        try:
            model = ResNet101(layers=(1, 1, 2, 1))
            variables = model.init(jax.random.PRNGKey(0), x, False)

            def loss(params):
                (f4, f1), _ = model.apply(
                    {'params': params, 'batch_stats': variables['batch_stats']},
                    x, True, mutable=['batch_stats'])
                return jnp.sum(f4 ** 2) * 1e-3 + jnp.sum(f1 ** 2) * 1e-4

            val, grads = jax.value_and_grad(loss)(variables['params'])
            return float(val), jax.tree.map(np.asarray, grads)
        finally:
            settings.BACKBONE_REMAT = old

    val0, grads0 = run(0)
    val1, grads1 = run(mode)
    assert abs(val0 - val1) < 1e-5 * abs(val0)
    for a, b in zip(jax.tree.leaves(grads0), jax.tree.leaves(grads1)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_zero_init_last_bn_false_reproduces_reference_effective_init():
    """zero_init_last_bn=False (the reference's EFFECTIVE init — its init
    loop re-overwrites bn3 back to 1.0, models/resnet.py docstring) must be
    reachable through the public DSRL model, not just raw Bottlenecks."""
    model = DSRL(stage=1, num_classes=19, backbone_layers=(1, 1, 2, 1),
                 zero_init_last_bn=False)
    x = jnp.zeros((1, *TINY_HW, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, False)
    sd = state_dict(variables)
    np.testing.assert_array_equal(sd['feature_extractor.backbone.layer1.0.bn3.weight'], 1.0)


def test_even_hw_select_matches_strided_slice_on_odd_dims(rng):
    """_even_hw_select documents itself as ``y[:, ::2, ::2]`` — that slice
    keeps ceil(h/2) rows, including for ODD extents (reachable via a model
    input size that is 2 mod 4)."""
    from dualsuperreslearningforsemseg_tpu.models.dsrl import _even_hw_select
    for h, w in [(6, 10), (5, 9), (7, 10), (6, 11)]:
        y = jnp.asarray(rng.standard_normal((2, h, w, 4, 3)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(_even_hw_select(y)),
                                      np.asarray(y[:, ::2, ::2]))
        y4 = y.reshape(2, h, w, 12)
        np.testing.assert_array_equal(np.asarray(_even_hw_select(y4)),
                                      np.asarray(y4[:, ::2, ::2]))
