"""Run one of the auxiliary scripts in the ``scripts`` package by name.

Counterpart of the reference's dispatcher (/root/reference/run_script.py:1-19);
this one also lists the available script names in its help and exits nonzero
on an unknown name.
"""

import sys

import scripts
from dualsuperreslearningforsemseg_tpu.utils import FATAL, OverridePrintWithTQDMWriteAndLog


def _script_names():
    return sorted(name for name in dir(scripts)
                  if not name.startswith('_') and callable(getattr(scripts, name)))


def main(argv) -> int:
    if not argv or argv[0].casefold() in ('-h', '--help'):
        print("Runs an auxiliary script from the 'scripts' package.\n"
              "Usage: python run_script.py <SCRIPT_NAME> [SCRIPT_ARGS...]\n"
              "Available scripts: {:s}\n"
              "Pass '-h' after a script name for that script's own help."
              .format(', '.join(_script_names())))
        return 0

    script = getattr(scripts, argv[0], None)
    if not callable(script):
        print(FATAL("No script named '{:s}'; available: {:s}".format(
            argv[0], ', '.join(_script_names()))))
        return 1
    script(argv[1:])
    return 0


if __name__ == '__main__':
    with OverridePrintWithTQDMWriteAndLog():
        sys.exit(main(sys.argv[1:]))
