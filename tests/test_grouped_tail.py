"""Grouped-tail mode: identical outputs/losses vs the plain layout."""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.ops.conv import ungroup_2x2, group_labels
from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss


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
    # SISR identical
    np.testing.assert_allclose(np.asarray(grouped[1]), np.asarray(plain[1]),
                               rtol=1e-6, atol=1e-6)
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

    # group both consistently: logits (B,8,16,16,19), labels (B,8,16,16)
    b, h, w, c = logits_plain.shape
    lg = logits_plain.reshape(b, h // 4, 4, w // 4, 4, c)
    lg = jnp.transpose(lg, (0, 1, 3, 2, 4, 5)).reshape(b, h // 4, w // 4, 16, c)
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
