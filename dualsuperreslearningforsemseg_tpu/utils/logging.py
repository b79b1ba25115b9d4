"""Console/log plumbing.

Behavioral parity with the reference's console layer
(/root/reference/utils.py:54-99,183-190): colored INFO/CAUTION/FATAL
prefixes, a context manager that tees every ``print`` through ``tqdm.write``
and an optional log file, and a conditional context manager used to gate
rank-0-only resources.  The implementation is this repo's own: a sink-list
tee, lazy file opening in ``__enter__``, and ``contextlib.nullcontext`` for
the disabled branch of the conditional manager.
"""

import builtins
import contextlib
import sys

import termcolor
from tqdm.auto import tqdm

# Severity tag -> (termcolor color, extra attrs).  One table instead of three
# near-identical function bodies; the rendered strings are the CLI contract.
_SEVERITY_STYLE = {
    'INFO': ('green', None),
    'CAUTION': ('yellow', None),
    'FATAL': ('red', ['reverse', 'blink']),
}


def _tagged(tag, text, prefix):
    color, attrs = _SEVERITY_STYLE[tag]
    return termcolor.colored(f"{prefix}{tag}: {text}", color, attrs=attrs)


def INFO(text, prefix=''):
    return _tagged('INFO', text, prefix)


def CAUTION(text, prefix=''):
    return _tagged('CAUTION', text, prefix)


def FATAL(text, prefix=''):
    return _tagged('FATAL', text, prefix)


class OverridePrintWithTQDMWriteAndLog:
    """Tee ``sys.stdout`` to an optional log file and route ``print`` through
    ``tqdm.write`` so progress bars are not clobbered by log lines.

    Acts as a file-like object itself: while active, ``sys.stdout`` is this
    instance, and every ``write``/``flush`` fans out to the real stdout plus
    (if configured) the log file.  ``print`` falls back to the builtin when
    ``tqdm.write`` raises (e.g. closed/invalid stream mid-teardown).
    """

    def __init__(self, log_filename=None):
        self._log_filename = log_filename
        # Before __enter__ (or after a stray manual install), writes forward
        # to the current real stdout instead of vanishing.
        self._sinks = (sys.stdout,)
        self._saved = None  # (sys.stdout, builtins.print) while active

    # -- file-like interface (installed as sys.stdout while active) --
    def write(self, text):
        for sink in self._sinks:
            sink.write(text)

    def flush(self):
        for sink in self._sinks:
            sink.flush()

    # -- context manager --
    def __enter__(self):
        real_stdout, real_print = sys.stdout, builtins.print
        self._saved = (real_stdout, real_print)
        self._sinks = (real_stdout,)
        if self._log_filename:
            self._sinks += (open(self._log_filename, 'w+'),)

        def print_via_tqdm(*args, **kwargs):
            try:
                tqdm.write(*args, **kwargs)
            except Exception:
                real_print(*args, **kwargs)

        sys.stdout = self
        builtins.print = print_via_tqdm
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback):
        if self._saved is None:  # defensive teardown without __enter__
            return
        real_stdout = self._saved[0]
        sys.stdout, builtins.print = self._saved
        for sink in self._sinks[1:]:  # close only what we opened
            sink.close()
        # Anything that captured THIS instance as its stream during the block
        # (logging handlers, tqdm bars, cached sys.stdout) may write after
        # exit — keep forwarding those to the real stdout rather than
        # silently discarding them; only the log file stops.
        self._sinks = (real_stdout,)
        self._saved = None


class ConditionalContextManager:
    """``with ConditionalContextManager(pred, make_ctx) as x`` — enters
    ``make_ctx()`` when ``pred`` is truthy, otherwise ``func_false()``
    (default: yields ``None``).  Either factory may return a plain value
    instead of a context manager; it is passed through unmanaged."""

    def __init__(self, expr_to_check, func_true, func_false=lambda: None):
        assert all(callable(f) for f in [func_true, func_false]), \
            "BUG CHECK: Both 'func_true' and 'func_false' arguments must be 'Callable' type!"
        made = (func_true if expr_to_check else func_false)()
        if not hasattr(made, '__enter__'):
            made = contextlib.nullcontext(made)
        self._ctx = made

    def __enter__(self):
        return self._ctx.__enter__()

    def __exit__(self, exc_type, exc_value, exc_traceback):
        return self._ctx.__exit__(exc_type, exc_value, exc_traceback)
