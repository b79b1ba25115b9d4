"""Unit tests for the --distributed 7-tuple -> jax.distributed translation
(/root/reference/main.py:19-43: WORLD_SIZE = NODES x DEVICES_PER_NODE with one
single-GPU process per device; here one JAX process per node owns every local
chip, so the process world is NODES)."""

from dualsuperreslearningforsemseg_tpu.parallel import distributed_init_kwargs


def _tuple(**overrides):
    base = dict(MASTER_ADDR='10.0.0.1', MASTER_PORT='29500', NODES=4,
                DEVICES_PER_NODE=8, BACKEND='nccl', INIT_METHOD=' ', NODE_ID=2)
    base.update(overrides)
    return base


def test_maps_nodes_to_process_count_and_node_id_to_process_id():
    kwargs, _ = distributed_init_kwargs(_tuple())
    assert kwargs == dict(coordinator_address='10.0.0.1:29500',
                          num_processes=4, process_id=2)


def test_string_typed_nodes_are_coerced():
    kwargs, _ = distributed_init_kwargs(_tuple(NODES='3', NODE_ID='0'))
    assert kwargs['num_processes'] == 3 and kwargs['process_id'] == 0


def test_backend_choice_warns_but_does_not_fail():
    for backend in ('nccl', 'gloo', 'mpi'):
        _, cautions = distributed_init_kwargs(_tuple(BACKEND=backend))
        assert any(backend in c for c in cautions), \
            "expected a caution naming the ignored backend '{}'".format(backend)
    _, cautions = distributed_init_kwargs(_tuple(BACKEND='xla'))
    assert not any('backend' in c.lower() for c in cautions)


def test_init_method_env_sentinel_is_silent():
    # The reference treats ' ' as "use env:// rendezvous" (utils.py:172-173);
    # both spellings are the default here and must not warn.
    for init_method in (' ', '', 'env://', None):
        _, cautions = distributed_init_kwargs(_tuple(INIT_METHOD=init_method))
        assert not any('INIT_METHOD' in c for c in cautions)
    _, cautions = distributed_init_kwargs(_tuple(INIT_METHOD='tcp://10.0.0.1:1234'))
    assert any('INIT_METHOD' in c for c in cautions)


def test_devices_per_node_does_not_change_process_world():
    kwargs_a, _ = distributed_init_kwargs(_tuple(DEVICES_PER_NODE=1))
    kwargs_b, _ = distributed_init_kwargs(_tuple(DEVICES_PER_NODE=16))
    assert kwargs_a == kwargs_b


class _Cap:
    def __init__(self):
        self.lines = []

    def __call__(self, *args, **kwargs):
        self.lines.append(' '.join(str(a) for a in args))


def _align(monkeypatch, env_value, barrier_ok=True, compile_raises=False):
    """Drive align_first_dispatch with a stubbed 2-process world and capture
    its prints; returns (printed lines, compile_fn call count)."""
    from dualsuperreslearningforsemseg_tpu.parallel import mesh as pm
    monkeypatch.setattr(pm.jax, 'process_count', lambda: 2)
    monkeypatch.setattr(pm.jax, 'process_index', lambda: 0)
    monkeypatch.setattr(pm, 'rendezvous_barrier', lambda name: barrier_ok)
    cap = _Cap()
    monkeypatch.setattr('builtins.print', cap)
    if env_value is None:
        monkeypatch.delenv('DSRL_TPU_INJECT_COMPILE_DELAY', raising=False)
    else:
        monkeypatch.setenv('DSRL_TPU_INJECT_COMPILE_DELAY', env_value)
    calls = []

    def compile_fn():
        calls.append(1)
        if compile_raises:
            raise RuntimeError('boom')

    pm.align_first_dispatch('unit', compile_fn)
    return cap.lines, len(calls)


def test_align_malformed_injection_env_is_ignored_with_caution(monkeypatch):
    # A leftover/typo'd test knob must never abort a production run
    # (int('all') / float('45s') would otherwise raise inside the align path).
    for bad in ('1:45s', 'all:10', '45', ':', 'x'):
        lines, ncalls = _align(monkeypatch, bad)
        assert ncalls == 1
        assert any('malformed DSRL_TPU_INJECT_COMPILE_DELAY' in l for l in lines), bad
        assert any('aligned across 2 processes' in l for l in lines), bad


def test_align_claims_alignment_only_when_barrier_and_compile_succeed(monkeypatch):
    # The distributed tests assert on the INFO string; it must not be
    # printable when the barrier was unavailable or the compile failed,
    # or a silently-disabled barrier would be undetectable.
    lines, _ = _align(monkeypatch, None, barrier_ok=True)
    assert any('aligned across 2 processes' in l for l in lines)
    lines, _ = _align(monkeypatch, None, barrier_ok=False)
    assert not any('aligned across 2 processes' in l for l in lines)
    lines, _ = _align(monkeypatch, None, compile_raises=True)
    assert not any('aligned across 2 processes' in l for l in lines)
    assert any('AOT pre-compile' in l for l in lines)


def test_align_injects_delay_on_matching_rank_only(monkeypatch):
    import time as _time
    slept = []
    from dualsuperreslearningforsemseg_tpu.parallel import mesh as pm
    monkeypatch.setattr(pm.time, 'sleep', lambda s: slept.append(s))
    lines, _ = _align(monkeypatch, '0:0.25')  # stubbed process_index() == 0
    assert slept == [0.25]
    slept.clear()
    _align(monkeypatch, '1:0.25')  # other rank: no sleep here
    assert slept == []
