"""Weight initializers matching the reference's init recipe.

The reference Kaiming-normal-initializes every Conv2d/ConvTranspose2d with
``mode='fan_out', nonlinearity='relu'`` and leaves conv biases at torch's
default uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
(/root/reference/models/DSRL.py:143-151,
/root/reference/models/modules/backbone/ResNet101.py:44-55).

Fan computations follow torch's ``_calculate_fan_in_and_fan_out``:
for an OIHW conv weight fan_out = O*kh*kw and fan_in = I*kh*kw; for an IOHW
transposed-conv weight torch reads dim 0 as "output maps", so kaiming fan_out
is I*kh*kw and the default-bias fan_in is O*kh*kw.
"""

import numpy as np
import jax
import jax.numpy as jnp


def kaiming_normal_fan_out_conv(key, shape, dtype=jnp.float32):
    """For flax HWIO conv kernels: std = sqrt(2 / (O*kh*kw))."""
    kh, kw, _, o = shape
    std = float(np.sqrt(2.0 / (o * kh * kw)))
    return jax.random.normal(key, shape, dtype) * std


def kaiming_normal_fan_out_convtranspose(key, shape, dtype=jnp.float32):
    """For IOHW transposed-conv weights: torch fan_out = I*kh*kw."""
    i, _, kh, kw = shape
    std = float(np.sqrt(2.0 / (i * kh * kw)))
    return jax.random.normal(key, shape, dtype) * std


def torch_conv_bias_init(fan_in: int):
    """torch Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = float(1.0 / np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
