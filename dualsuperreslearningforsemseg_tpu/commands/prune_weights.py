"""`prune-weights` command: strip a checkpoint/weights file down to the
stage-1 inference parameters (/root/reference/command_handlers/
prune_weights.py:11-19) — drops SISR/FA-transformer params + optimizer state.

NB: the reference loads with strict=True, which errors on stage-2/3 inputs
(they carry extra keys); we use strict=False so pruning works on any stage's
weights, which is the command's documented purpose (README.md:90)."""

import os.path

from ..checkpoint import load_checkpoint_or_weights, save_weights
from ..models import DSRL, state_dict, load_state_dict
from ..utils import INFO
from .test import _init_eval_variables


def prune_weights(src_weights, dest_weights, dataset, torch_format=False, **other_args):
    model = DSRL(stage=1, num_classes=dataset['settings'].NUM_CLASSES)
    variables = _init_eval_variables(model)

    src_dict = load_checkpoint_or_weights(src_weights)
    variables, _, _ = load_state_dict(variables, src_dict['model_state_dict'], strict=False)

    if torch_format:
        # Interop escape hatch: emit a torch-zip .pth of the stage-1 state
        # dict (torch-style key names + OIHW tensors) loadable by torch.load.
        from ..checkpoint import save_torch_pth
        save_torch_pth(state_dict(variables), dest_weights)
    else:
        save_weights(*os.path.split(dest_weights), state_dict(variables),
                     src_dict.get('mixed_precision'), src_dict.get('amp_state_dict'))
    print(INFO("Output weight saved in '{:s}'.".format(dest_weights)))
