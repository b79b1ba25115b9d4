"""Grouped-tail mode: identical outputs/losses vs the plain layout."""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.ops.conv import (ungroup_2x2, group_labels,
                                                        pixel_shuffle, pixel_unshuffle)
from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss, mse_loss


def test_grouped_outputs_equal_plain(rng):
    model = DSRL(stage=3, num_classes=19)
    hw = (64, 128)
    x = jnp.asarray(rng.standard_normal((2, *hw, 3), dtype=np.float32))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, False)

    plain = model.apply(variables, x, False)
    grouped = model.apply(variables, x, False, False, True)

    # SSSR: ungrouped grouped output == plain output
    assert grouped[0].shape == (2, hw[0] // 2, hw[1] // 2, 16, 19)
    np.testing.assert_allclose(np.asarray(ungroup_2x2(grouped[0])),
                               np.asarray(plain[0]), rtol=1e-5, atol=1e-5)
    # SISR: grouped output is pre-shuffle; shuffling it reproduces the plain
    # full-res output, and the grouped MSE against an unshuffled target is
    # the plain MSE (permutation invariance).
    np.testing.assert_allclose(np.asarray(pixel_shuffle(grouped[1], 8)),
                               np.asarray(plain[1]), rtol=1e-6, atol=1e-6)
    target = jnp.asarray(rng.standard_normal(plain[1].shape, dtype=np.float32))
    np.testing.assert_allclose(float(mse_loss(grouped[1], pixel_unshuffle(target, 8))),
                               float(mse_loss(plain[1], target)), rtol=1e-5)
    # FA transforms identical (stride-8 == group-0 slice)
    np.testing.assert_allclose(np.asarray(grouped[2]), np.asarray(plain[2]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grouped[3]), np.asarray(plain[3]),
                               rtol=1e-6, atol=1e-6)


def test_grouped_ce_equals_plain_ce(rng):
    logits_plain = jnp.asarray(rng.standard_normal((2, 32, 64, 19), dtype=np.float32))
    seg = rng.integers(0, 19, size=(2, 32, 64))
    seg[0, :3] = 255
    seg = jnp.asarray(seg)

    ce_plain = float(cross_entropy_loss(logits_plain, seg, 255))

    # group both consistently in the NESTED order (ops/conv.py): logits
    # (B,8,16,16,19) with g=((i*2+j)*2+k)*2+l <-> pixel (4h+2i+k, 4w+2j+l).
    b, h, w, c = logits_plain.shape
    lg = logits_plain.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)   # (h,i,k,w,j,l)
    lg = jnp.transpose(lg, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(b, h // 4, w // 4, 16, c)
    sg = group_labels(seg, 4)
    ce_grouped = float(cross_entropy_loss(lg, sg, 255))
    # identical math, different f32 reduction order
    assert abs(ce_plain - ce_grouped) < 1e-5


def test_grouped_batchnorm_stats_match_plain(rng):
    """Running-stat updates must be identical in grouped mode (same element
    multiset per channel)."""
    model = DSRL(stage=1, num_classes=19)
    x = jnp.asarray(rng.standard_normal((2, 64, 128, 3), dtype=np.float32))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, False)

    _, mut_plain = model.apply(variables, x, True, False, False,
                               rngs={'dropout': jax.random.PRNGKey(2)},
                               mutable=['batch_stats'])
    _, mut_grouped = model.apply(variables, x, True, False, True,
                                 rngs={'dropout': jax.random.PRNGKey(2)},
                                 mutable=['batch_stats'])
    bn_plain = mut_plain['batch_stats']['SSSR_decoder']['upsample16_pred.3']
    bn_grouped = mut_grouped['batch_stats']['SSSR_decoder']['upsample16_pred.3']
    np.testing.assert_allclose(np.asarray(bn_plain['running_mean']),
                               np.asarray(bn_grouped['running_mean']),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bn_plain['running_var']),
                               np.asarray(bn_grouped['running_var']),
                               rtol=1e-4, atol=1e-6)


def test_fused_step_with_preunshuffled_target(rng):
    """A fused train step whose post fn emits img_hi pre-unshuffled
    (make_device_post_fn(unshuffle_hi=8)) must produce the same losses and
    params as the plain full-res-target post: the unshuffle moves across the
    step boundary, the MSE multiset is unchanged."""
    from dualsuperreslearningforsemseg_tpu.data import AugmentConfig
    from dualsuperreslearningforsemseg_tpu.data.augment import make_device_post_fn
    from dualsuperreslearningforsemseg_tpu.train import (sgd_init,
                                                         make_train_step,
                                                         TrainState)

    model = DSRL(stage=2, num_classes=19)
    hw = (64, 128)
    out_hw = (2 * hw[0], 2 * hw[1])
    x = jnp.zeros((2, *hw, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(11),
                            'dropout': jax.random.PRNGKey(12)}, x, False)
    imgs_u8 = jnp.asarray(rng.integers(0, 256, (2, *out_hw, 3)), jnp.uint8)
    segs_u8 = jnp.asarray(rng.integers(0, 19, (2, *out_hw)), jnp.uint8)
    cfg = AugmentConfig(input_hw=hw, output_hw=out_hw,
                        blur_p=0.5, grayscale_p=0.5)

    def run(unshuffle):
        post = make_device_post_fn(cfg, unshuffle_hi=8 if unshuffle else 0)
        step = make_train_step(model, stage=2, w1=0.1, w2=1.0, momentum=0.9,
                               weight_decay=0.0005, post_fn=post,
                               fused_tail=False)
        state = TrainState(variables['params'], variables['batch_stats'],
                           sgd_init(variables['params']))
        state, losses = step(state, imgs_u8, segs_u8, jnp.float32(0.01),
                             jax.random.PRNGKey(21))
        return state, losses

    state_a, losses_a = run(False)
    state_b, losses_b = run(True)
    for k in ('CE', 'MSE', 'Total'):
        np.testing.assert_allclose(float(losses_a[k]), float(losses_b[k]),
                                   rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        state_a.params, state_b.params)
