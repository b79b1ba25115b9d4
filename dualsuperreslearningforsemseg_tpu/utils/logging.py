"""Console/log plumbing.

Behavioral parity with the reference's console layer
(/root/reference/utils.py:54-99,183-190): colored INFO/CAUTION/FATAL
prefixes, a context manager that tees every ``print`` through ``tqdm.write``
and an optional log file, and a conditional context manager used to gate
rank-0-only resources.
"""

import builtins
import sys

import termcolor
from tqdm.auto import tqdm


def INFO(text, prefix=''):
    return termcolor.colored("{0}INFO: {1}".format(prefix, text), 'green')


def CAUTION(text, prefix=''):
    return termcolor.colored("{0}CAUTION: {1}".format(prefix, text), 'yellow')


def FATAL(text, prefix=''):
    return termcolor.colored("{0}FATAL: {1}".format(prefix, text), 'red', attrs=['reverse', 'blink'])


class OverridePrintWithTQDMWriteAndLog:
    """Redirect ``print`` through ``tqdm.write`` and tee stdout to a file."""

    def __init__(self, log_filename=None):
        self.logfile = open(log_filename, 'w+') if log_filename else None
        self.old_stdout = sys.stdout
        self.old_print = builtins.print

    def write(self, text):
        self.old_stdout.write(text)
        if self.logfile:
            self.logfile.write(text)

    def flush(self):
        self.old_stdout.flush()
        if self.logfile:
            self.logfile.flush()

    def __enter__(self):
        sys.stdout = self

        old_print = self.old_print

        def new_print(*args, **kwargs):
            try:
                tqdm.write(*args, **kwargs)
            except Exception:
                old_print(*args, **kwargs)

        builtins.print = new_print
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback):
        if self.logfile:
            self.logfile.close()
        sys.stdout = self.old_stdout
        builtins.print = self.old_print


class ConditionalContextManager:
    """Enter ``func_true()`` when the predicate holds, else ``func_false()``."""

    def __init__(self, expr_to_check, func_true, func_false=lambda: None):
        assert all(callable(f) for f in [func_true, func_false]), \
            "BUG CHECK: Both 'func_true' and 'func_false' arguments must be 'Callable' type!"
        self.ctx = func_true() if expr_to_check else func_false()

    def __enter__(self):
        return self.ctx.__enter__() if hasattr(self.ctx, '__enter__') else self.ctx

    def __exit__(self, exc_type, exc_value, exc_traceback):
        if hasattr(self.ctx, '__exit__'):
            self.ctx.__exit__(exc_type, exc_value, exc_traceback)
