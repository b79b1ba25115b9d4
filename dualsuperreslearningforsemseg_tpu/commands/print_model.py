"""`print-model` command (/root/reference/command_handlers/print_model.py:7-11):
layer dump + trainable/total parameter counts."""

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import settings
from ..models import DSRL, count_params
from ..utils import INFO


def print_model(stage, dataset, **other_args):
    model = DSRL(stage=stage, num_classes=dataset['settings'].NUM_CLASSES)
    x = jnp.zeros((1, *settings.MODEL_INPUT_SIZE, 3), jnp.float32)
    from ..models.host_init import host_init_context
    with host_init_context():
        print(nn.tabulate(model, {'params': jax.random.PRNGKey(0),
                                  'dropout': jax.random.PRNGKey(1)},
                          depth=3)(x, False))
        variables = jax.jit(model.init, static_argnums=(2,))(
            {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}, x, False)
    trainable, total = count_params(variables)
    print(INFO("Total training parameters: {0:,}\nTotal parameters: {1:,}".format(trainable, total), prefix='\n'))
