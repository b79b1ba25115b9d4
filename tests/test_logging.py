"""Console tee (utils/logging.py): severity tags, stdout+logfile fan-out,
and the late-writer contract — code that cached the tee as ``sys.stdout``
during the block must keep reaching the real stdout after ``__exit__``
(reference console layer: /root/reference/utils.py:54-99,183-190)."""

import builtins
import contextlib
import io
import sys

from dualsuperreslearningforsemseg_tpu.utils.logging import (
    CAUTION, ConditionalContextManager, FATAL, INFO,
    OverridePrintWithTQDMWriteAndLog)


def test_severity_tags_render_tag_and_prefix():
    assert 'INFO: hello' in INFO('hello')
    assert 'CAUTION: careful' in CAUTION('careful')
    assert 'FATAL: boom' in FATAL('boom')
    assert '\nFATAL: x' in FATAL('x', prefix='\n')  # prefix lands inside


def test_tee_writes_stdout_and_logfile(tmp_path, capsys):
    log = tmp_path / 'run.log'
    with OverridePrintWithTQDMWriteAndLog(str(log)) as tee:
        assert sys.stdout is tee
        sys.stdout.write('direct-line\n')
    assert sys.stdout is not tee
    assert 'direct-line' in capsys.readouterr().out
    assert 'direct-line' in log.read_text()


def test_late_writer_still_reaches_real_stdout(tmp_path, capsys):
    """A stream captured during the block (logging handler, tqdm bar,
    cached sys.stdout) may write after exit; those writes must forward to
    the real stdout, not vanish into a cleared sink list — and must NOT
    keep landing in the closed log file."""
    log = tmp_path / 'late.log'
    with OverridePrintWithTQDMWriteAndLog(str(log)):
        captured = sys.stdout
        captured.write('in-block\n')
    captured.write('after-block\n')
    captured.flush()
    out = capsys.readouterr().out
    assert 'in-block' in out and 'after-block' in out
    assert 'after-block' not in log.read_text()


def test_print_falls_back_to_builtin_when_tqdm_raises(monkeypatch, capsys):
    from tqdm.auto import tqdm as tqdm_cls

    def explode(*a, **k):
        raise ValueError('closed stream')

    with OverridePrintWithTQDMWriteAndLog():
        monkeypatch.setattr(tqdm_cls, 'write', staticmethod(explode))
        print('survives-teardown')
    assert 'survives-teardown' in capsys.readouterr().out


def test_conditional_context_manager_branches():
    entered = []

    @contextlib.contextmanager
    def real_ctx():
        entered.append(True)
        yield 'resource'

    with ConditionalContextManager(True, real_ctx) as x:
        assert x == 'resource' and entered
    with ConditionalContextManager(False, real_ctx) as x:
        assert x is None
    # plain (non-context) factory values pass through unmanaged
    with ConditionalContextManager(True, lambda: 42) as x:
        assert x == 42
