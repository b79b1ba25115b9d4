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
import numpy as np

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


_BN_BUFFER_SUFFIXES = ('running_mean', 'running_var', 'num_batches_tracked')


def _torch_sgd_buffers_by_name(state_dict, model_state_dict):
    """Translate torch SGD's id-keyed ``state``/``param_groups`` layout
    (/root/reference/utils.py:270-282 persists it verbatim via t.save) into
    a {torch_param_name: momentum_buffer} dict.

    torch assigns ids by enumerating the optimizer's parameters across its
    groups in registration order; for the reference's single
    ``SGD(model.parameters())`` group that order is exactly the model's
    ``named_parameters()`` order — which is the checkpoint's own
    ``model_state_dict`` key order with BN buffers (non-parameters) removed.
    Ids absent from ``state`` are params torch never stepped (lazy buffer
    creation); they keep the template's zeros, matching torch's resume.
    """
    if model_state_dict is None:
        raise ValueError(
            "A torch-format optimizer_state_dict is id-keyed; rebuilding the "
            "name mapping needs the checkpoint's model_state_dict for the "
            "parameter registration order — pass it alongside.")
    names = [k for k in model_state_dict
             if not k.endswith(_BN_BUFFER_SUFFIXES)]
    flat_ids = [pid for group in state_dict['param_groups']
                for pid in group['params']]
    if len(flat_ids) != len(names):
        raise ValueError(
            "torch optimizer state covers {} parameters but the checkpoint's "
            "model_state_dict has {} — the checkpoint was not written by the "
            "reference's SGD(model.parameters()) setup.".format(
                len(flat_ids), len(names)))
    state = state_dict['state']
    buffers = {}
    for position, pid in enumerate(flat_ids):
        entry = state.get(pid, state.get(str(pid)))  # json round-trips stringify
        if entry is not None and entry.get('momentum_buffer') is not None:
            buffers[names[position]] = np.asarray(entry['momentum_buffer'])
    return buffers


def load_optimizer_state_dict(momentum_buffers_template, state_dict,
                              model_state_dict=None):
    """Rebuild the momentum pytree from a persisted optimizer state dict.

    Accepts both layouts: this repo's ``{'momentum_buffers': {name: buf}}``
    and torch SGD's ``{'state': {id: {'momentum_buffer': ...}},
    'param_groups': [...]}`` as written into reference ``.checkpoint`` files
    (/root/reference/command_handlers/train_or_resume.py:74-77) — so
    ``resume-train`` runs unchanged on a reference-written checkpoint.
    """
    from ..models.state_dict import load_state_dict
    if 'momentum_buffers' in state_dict:
        buffers = state_dict['momentum_buffers']
        lazy_ok = False
    elif 'state' in state_dict and 'param_groups' in state_dict:
        buffers = _torch_sgd_buffers_by_name(state_dict, model_state_dict)
        lazy_ok = True  # ids torch never stepped legitimately have no buffer
    else:
        raise KeyError(
            "Unrecognized optimizer_state_dict layout: expected "
            "'momentum_buffers' (this repo) or 'state'+'param_groups' "
            "(torch SGD); got keys {}".format(sorted(state_dict)[:8]))
    wrapped = {'params': momentum_buffers_template}
    new_vars, missing, unexpected = load_state_dict(
        wrapped, buffers, strict=not lazy_ok)
    if unexpected:
        raise KeyError("optimizer state has buffers for unknown parameters: "
                       "{}".format(unexpected[:8]))
    return new_vars['params']
