"""Bidirectional conversion: flax variables <-> torch-style flat state dicts.

The reference persists ``model_state_dict`` dictionaries keyed by torch
module paths ("feature_extractor.backbone.layer1.0.conv1.weight", ...) in its
``.weights``/``.checkpoint`` files (/root/reference/utils.py:270-282) and
warm-starts stages with ``strict=False`` loads
(/root/reference/command_handlers/train_or_resume.py:96).  Our flax module
tree intentionally uses the same module names, so the conversion is purely
mechanical:

* ``nn.Conv`` kernels (leaf name ``kernel``, HWIO) <-> torch ``weight`` (OIHW);
* ``ConvTranspose2x2`` weights are stored in torch IOHW layout already;
* ``TorchBatchNorm`` leaves are already torch-named
  (weight/bias/running_mean/running_var/num_batches_tracked), with running
  stats living in the ``batch_stats`` collection.
"""

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def _walk(tree, prefix, out):
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, dict):
            _walk(value, path, out)
        else:
            out[path] = value


def flatten_variables(variables) -> Dict[str, jnp.ndarray]:
    """Flatten {'params': ..., 'batch_stats': ...} to flat torch-named keys."""
    flat = {}
    _walk(variables.get('params', {}), '', flat)
    _walk(variables.get('batch_stats', {}), '', flat)
    return flat


def _to_torch_name_and_array(flat_key: str, value) -> Tuple[str, np.ndarray]:
    arr = np.asarray(value)
    if flat_key.endswith('.kernel'):
        # flax conv kernel HWIO -> torch OIHW
        return flat_key[:-len('.kernel')] + '.weight', np.transpose(arr, (3, 2, 0, 1))
    if flat_key.endswith('num_batches_tracked'):
        return flat_key, arr.astype(np.int64)
    return flat_key, arr


def state_dict(variables) -> Dict[str, np.ndarray]:
    """Export flax variables as a torch-style flat state dict (numpy)."""
    out = {}
    for key, value in flatten_variables(variables).items():
        name, arr = _to_torch_name_and_array(key, value)
        out[name] = arr
    return out


def load_state_dict(variables, torch_state: Dict[str, np.ndarray], strict: bool = True):
    """Load a torch-style flat dict into a copy of ``variables``.

    Returns (new_variables, missing_keys, unexpected_keys) mirroring torch's
    ``load_state_dict`` contract.  With ``strict=True`` raises on any missing
    or unexpected key.
    """
    template = flatten_variables(variables)
    consumed = set()
    new_flat = {}
    missing = []
    for flat_key, value in template.items():
        if flat_key.endswith('.kernel'):
            torch_name = flat_key[:-len('.kernel')] + '.weight'
        else:
            torch_name = flat_key
        if torch_name in torch_state:
            src = np.asarray(torch_state[torch_name])
            if flat_key.endswith('.kernel'):
                src = np.transpose(src, (2, 3, 1, 0))  # OIHW -> HWIO
            tgt = np.asarray(value)
            if src.shape != tgt.shape:
                raise ValueError("Shape mismatch for '{}': checkpoint {} vs model {}".format(
                    torch_name, src.shape, tgt.shape))
            new_flat[flat_key] = jnp.asarray(src.astype(tgt.dtype))
            consumed.add(torch_name)
        else:
            missing.append(torch_name)
            new_flat[flat_key] = value
    unexpected = [k for k in torch_state if k not in consumed]
    if strict and (missing or unexpected):
        raise KeyError("load_state_dict strict mismatch: missing={} unexpected={}".format(
            missing[:8], unexpected[:8]))

    def rebuild(tree, prefix):
        out = {}
        for key, value in tree.items():
            path = f"{prefix}.{key}" if prefix else str(key)
            if isinstance(value, dict):
                out[key] = rebuild(value, path)
            else:
                out[key] = new_flat[path]
        return out

    new_vars = {}
    if 'params' in variables:
        new_vars['params'] = rebuild(variables['params'], '')
    if 'batch_stats' in variables:
        new_vars['batch_stats'] = rebuild(variables['batch_stats'], '')
    for coll in variables:
        if coll not in new_vars:
            new_vars[coll] = variables[coll]
    return new_vars, missing, unexpected


def count_params(variables) -> Tuple[int, int]:
    """(trainable, total) parameter counts — parity with
    /root/reference/utils.py:262-268 (all params are trainable here)."""
    n = sum(int(np.prod(np.shape(v))) for v in flatten_variables({'params': variables.get('params', {})}).values())
    # torch's countModelParams iterates model.parameters() only (buffers such
    # as BN running stats are excluded), and every parameter requires grad.
    return n, n
