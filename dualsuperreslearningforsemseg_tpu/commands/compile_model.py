"""`compile-model` command: AOT compilation of the inference function.

TPU-native equivalent of the reference's TorchScript trace
(/root/reference/command_handlers/compile_model.py:11-21): the stage-1
forward (with weights baked in as constants) is lowered and serialized via
``jax.export`` (StableHLO).  `test --compiled-model` deserializes and calls
it, re-lowering for whatever backend is current.
"""

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .. import settings
from ..checkpoint import load_checkpoint_or_weights
from ..models import DSRL, load_state_dict
from ..utils import INFO
from .test import _init_eval_variables


def compile_model(weights, output_file, dataset, **other_args):
    model = DSRL(stage=1, num_classes=dataset['settings'].NUM_CLASSES)
    variables = _init_eval_variables(model)
    state = load_checkpoint_or_weights(weights)
    variables, _, _ = load_state_dict(variables, state['model_state_dict'], strict=False)

    print(INFO("Lowering model to StableHLO..."))
    fn = jax.jit(lambda x: model.apply(variables, x, False)[0])
    spec = jax.ShapeDtypeStruct((1, *settings.MODEL_INPUT_SIZE, 3), jnp.float32)
    exported = jax_export.export(fn)(spec)
    with open(output_file, 'wb') as f:
        f.write(exported.serialize())
    print(INFO("Compiled model saved to specified file."))


def load_compiled_model(path):
    with open(path, 'rb') as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)
