"""`inspect-checkpoint` command (/root/reference/command_handlers/
inspect_checkpoint.py:6-24): pretty-print checkpoint contents, skipping
arrays/tensors."""

import numpy as np

from ..checkpoint import load_checkpoint_or_weights


def inspect_checkpoint(checkpoint, **other_args):
    checkpoint_dict = load_checkpoint_or_weights(checkpoint)

    def prettyDictToStr(dict_):
        output = []
        for key in dict_:
            value = dict_[key]
            if isinstance(value, dict):
                output.append("{0}: {1}".format(key, prettyDictToStr(value)))
            elif isinstance(value, (np.ndarray, list)):
                output.append(str(key))
            elif isinstance(value, str):
                output.append("{0:s}: \"{1}\"".format(key, value))
            else:
                output.append("{0:s}: {1}".format(key, str(value)))
        return "{{{:s}}}".format(', '.join(output))

    print(prettyDictToStr(checkpoint_dict))
