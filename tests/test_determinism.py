"""Fixed-seed determinism: the reference's distributed-correctness contract
rests on identical seeded init (train_or_resume.py:28-31); ours additionally
guarantees bitwise-deterministic steps given the same keys."""

import numpy as np
import jax
import jax.numpy as jnp

from dualsuperreslearningforsemseg_tpu.models import DSRL
from dualsuperreslearningforsemseg_tpu.train import sgd_init, make_train_step, TrainState


def _state(model, x):
    variables = model.init({'params': jax.random.PRNGKey(54321),
                            'dropout': jax.random.PRNGKey(54322)}, x, False)
    return TrainState(variables['params'], variables['batch_stats'],
                      sgd_init(variables['params']))


def test_train_step_deterministic(rng):
    model = DSRL(stage=1, num_classes=19)
    hw = (64, 128)
    x = jnp.zeros((2, *hw, 3), jnp.float32)
    img_lo = jnp.asarray(rng.standard_normal((2, *hw, 3), dtype=np.float32))
    img_hi = jnp.asarray(rng.standard_normal((2, 2 * hw[0], 2 * hw[1], 3), dtype=np.float32))
    seg = jnp.asarray(rng.integers(0, 19, size=(2, 2 * hw[0], 2 * hw[1])).astype(np.int32))

    losses = []
    params_after = []
    for _ in range(2):
        # donation invalidates buffers, so rebuild identically each time
        step = make_train_step(model, 1, 0.1, 1.0, 0.9, 0.0005, 255)
        st = _state(model, x)
        st, l = step(st, img_lo, img_hi, seg, jnp.float32(0.01), jax.random.PRNGKey(7))
        st, l = step(st, img_lo, img_hi, seg, jnp.float32(0.01), jax.random.PRNGKey(8))
        losses.append(float(l['Total']))
        params_after.append(np.asarray(
            st.params['SSSR_decoder']['cls_conv']['kernel']))

    assert losses[0] == losses[1]
    np.testing.assert_array_equal(params_after[0], params_after[1])
