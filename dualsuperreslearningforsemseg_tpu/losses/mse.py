"""Mean-squared-error loss (torch.nn.MSELoss parity,
/root/reference/command_handlers/train_or_resume.py:117,436)."""

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)
