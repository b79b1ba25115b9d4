"""SGD with exact torch semantics (the reference's only optimizer,
/root/reference/command_handlers/train_or_resume.py:63-66).

torch.optim.SGD(momentum=m, weight_decay=wd, nesterov=False, dampening=0):

    g   <- grad + wd * p
    buf <- m * buf + g          (buf starts as g on the first step)
    p   <- p - lr * buf

Implemented as pure pytree functions — trivially shardable under jit (the
momentum tree shards like the parameters) and checkpointable by name.  The
persisted ``optimizer_state_dict`` is a flat {torch_param_name:
momentum_buffer} dict plus hyperparameters — a deliberate, documented
deviation from torch's index-keyed groups (our checkpoints are the only
consumers; names are more robust than indices).
"""

import jax
import jax.numpy as jnp

from ..models.state_dict import flatten_variables


def sgd_init(params):
    """Zero momentum buffers: buf_1 = m*0 + g_1 = g_1, identical to torch's
    lazy first-step buffer creation."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_update(params, grads, momentum_buffers, lr, momentum, weight_decay):
    def upd(p, g, buf):
        g = g.astype(jnp.float32) + weight_decay * p
        buf = momentum * buf + g
        return p - lr * buf, buf

    flat = jax.tree_util.tree_map(upd, params, grads, momentum_buffers)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_bufs = jax.tree_util.tree_map(lambda t: t[1], flat,
                                      is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_bufs


def optimizer_state_dict(momentum_buffers, learning_rate, momentum, weight_decay):
    # Momentum buffers share the params' layout, so they export through the
    # same rename/transpose as the model state dict (single source of truth).
    from ..models.state_dict import _to_torch_name_and_array
    flat = flatten_variables({'params': momentum_buffers})
    buffers = dict(_to_torch_name_and_array(key, value)
                   for key, value in flat.items())
    return {'momentum_buffers': buffers,
            'hyperparameters': {'learning_rate': learning_rate,
                                'momentum': momentum,
                                'weight_decay': weight_decay}}


def load_optimizer_state_dict(momentum_buffers_template, state_dict):
    """Rebuild the momentum pytree from a persisted optimizer state dict."""
    from ..models.state_dict import load_state_dict
    wrapped = {'params': momentum_buffers_template}
    new_vars, missing, unexpected = load_state_dict(
        wrapped, state_dict['momentum_buffers'], strict=True)
    return new_vars['params']
