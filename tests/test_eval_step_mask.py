"""Eval-step sample-mask exactness: padded rows must not change any loss or
metric relative to evaluating the unpadded batch."""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.train import make_eval_step


def _setup(stage):
    model = DSRL(stage=stage, num_classes=19)
    hw = (64, 128)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, False)
    return model, variables, hw


def test_padding_is_exact_stage3(rng):
    model, variables, hw = _setup(3)
    ohw = (2 * hw[0], 2 * hw[1])
    eval_step = make_eval_step(model, 3, 0.1, 1.0, 19, 255)

    b = 3
    img_lo = jnp.asarray(rng.standard_normal((b, *hw, 3), dtype=np.float32))
    img_hi = jnp.asarray(rng.standard_normal((b, *ohw, 3), dtype=np.float32))
    seg = jnp.asarray(rng.integers(0, 19, size=(b, *ohw)).astype(np.int32))

    # Unpadded reference
    losses_ref, _, hists_ref, acc_ref = eval_step(
        variables['params'], variables['batch_stats'], img_lo, img_hi, seg,
        jnp.ones((b,), jnp.float32))

    # Padded to 4 with junk rows + mask
    pad = 1
    img_lo_p = jnp.concatenate([img_lo, jnp.ones((pad, *hw, 3))])
    img_hi_p = jnp.concatenate([img_hi, jnp.ones((pad, *ohw, 3))])
    seg_p = jnp.concatenate([seg, jnp.full((pad, *ohw), 7, jnp.int32)])
    mask = jnp.asarray([1.0] * b + [0.0] * pad)
    losses_pad, _, hists_pad, acc_pad = eval_step(
        variables['params'], variables['batch_stats'], img_lo_p, img_hi_p,
        seg_p, mask)

    for k in losses_ref:
        assert abs(float(losses_ref[k]) - float(losses_pad[k])) < 1e-5, k
    for h_ref, h_pad in zip(hists_ref, hists_pad):
        np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_pad))
    assert int(acc_ref[0]) == int(acc_pad[0])
    assert int(acc_ref[1]) == int(acc_pad[1])
