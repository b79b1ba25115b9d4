"""Auxiliary script dispatcher (parity: /root/reference/run_script.py:1-19).

Usage: python run_script.py <SCRIPT_NAME> <SCRIPT_PARAMS>
"""

import sys

from dualsuperreslearningforsemseg_tpu.utils import FATAL, OverridePrintWithTQDMWriteAndLog
import scripts


def message_script_not_found(*unused):
    print(FATAL("Cannot find any matching implementation of given script name under 'scripts' directory."))


if __name__ == '__main__':
    with OverridePrintWithTQDMWriteAndLog():
        if len(sys.argv) < 2 or sys.argv[1].casefold() in ['-h', '--help']:
            print("Run specified scripts under 'scripts' directory.")
            print("Usage: scripts.py <SCRIPT_NAME> <SCRIPT_PARAMS>")
            print("<SCRIPT_PARAMS> can be '-h' or '--help' to show arguments accepted by the script.")
            sys.exit(0)

        script_to_call = getattr(scripts, sys.argv[1], message_script_not_found)
        script_to_call(sys.argv[2:])
