"""Compile-cache hygiene helpers (utils/fsutil.py).

These guard against the cross-machine XLA:CPU AOT hazard: /tmp travels
between hosts in some environments, and a CPU executable compiled on one
machine loads on another with mismatched ISA features (XLA only E-logs).
The rules under test:

* the CPU cache directory is keyed by the host's CPU identity;
* host-CPU param init inside an accelerator process must not touch the
  shared (host-independent) accelerator cache directory.
"""

import jax

from dualsuperreslearningforsemseg_tpu.utils.fsutil import (
    compile_cache_dir, host_init_cache_guard)


def test_cpu_cache_dir_is_host_keyed_and_stable():
    d1 = compile_cache_dir('cpu')
    d2 = compile_cache_dir('cpu')
    assert d1 == d2
    assert d1.startswith('/tmp/dsrl_tpu_jax_cache_cpu_')
    assert d1 != compile_cache_dir('tpu')


def test_cpu_cache_key_uses_live_cpuid():
    """The key must come from runtime CPUID, not just /proc/cpuinfo: the
    cpuinfo snapshot survives live VM migration unchanged while the actual
    CPU (and LLVM's tuning features, baked into AOT entries) changes —
    observed as a cpu_aot_loader feature-mismatch on a cpuinfo-keyed dir."""
    import platform
    from dualsuperreslearningforsemseg_tpu.utils import fsutil

    # Bypass the lru_cache: the masking claim (APIC-ID byte zeroed) must be
    # checked on two real probe executions, not a cached blob vs itself.
    probe = getattr(fsutil._live_cpuid_identity, '__wrapped__',
                    fsutil._live_cpuid_identity)
    blob1 = probe()
    blob2 = probe()
    assert blob1 == blob2  # per-core noise (APIC ID) must be masked out
    if platform.machine() == 'x86_64' and blob1:
        # b'' is legal even on x86_64 (W^X policy can deny the executable
        # page); when the probe does run, leaf 0 must carry a real vendor
        # string in EBX/EDX/ECX.
        import struct
        leaf0 = eval(blob1.decode())[0]
        vendor = struct.pack('<III', leaf0[3], leaf0[5], leaf0[4])
        assert vendor in (b'GenuineIntel', b'AuthenticAMD')

    # A different CPUID answer must change the directory.
    real = fsutil.compile_cache_dir('cpu')
    orig = fsutil._live_cpuid_identity
    fsutil._live_cpuid_identity = lambda: b'other-machine'
    try:
        assert fsutil.compile_cache_dir('cpu') != real
    finally:
        fsutil._live_cpuid_identity = orig
    assert fsutil.compile_cache_dir('cpu') == real


def test_pinned_cpu_platform_resolves_offline():
    """The suite pins jax to CPU (conftest); the shared resolver must decide
    that from the config string alone — it is the offline-safe path that
    must never touch a (possibly wedged) TPU tunnel."""
    from dualsuperreslearningforsemseg_tpu.utils.backend import (
        pinned_platform, resolve_backend)
    assert pinned_platform() == 'cpu'
    assert resolve_backend() == 'cpu'


def test_single_entry_pins_resolve_from_strings(monkeypatch):
    """Any SINGLE-entry pin must resolve without probing the backend ('axon'
    canonicalizes to the 'tpu' its PJRT client reports); multi-entry priority
    lists must probe, because jax may have fallen back past the first entry."""
    from dualsuperreslearningforsemseg_tpu.utils import backend

    monkeypatch.setattr(backend, '_pin', lambda: 'axon')
    assert backend.resolve_backend() == 'tpu'
    monkeypatch.setattr(backend, '_pin', lambda: 'tpu')
    assert backend.resolve_backend() == 'tpu'

    probed = []
    monkeypatch.setattr(backend, '_pin', lambda: 'axon,cpu')
    import jax
    monkeypatch.setattr(jax, 'default_backend', lambda: probed.append(1) or 'cpu')
    assert backend.resolve_backend() == 'cpu' and probed


def test_device_probe_gate_requires_exact_cpu_pin(monkeypatch):
    """jax.devices() may only be probed under an EXACT single-entry 'cpu'
    pin: a multi-entry list like 'cpu,axon' eagerly initializes every listed
    plugin, so even a cpu-first pin can block on the remote TPU tunnel."""
    from dualsuperreslearningforsemseg_tpu.utils import backend

    monkeypatch.setattr(backend, '_pin', lambda: 'cpu')
    assert backend.pinned_exactly('cpu')
    for pin in ('cpu,axon', 'axon,cpu', 'axon', ''):
        monkeypatch.setattr(backend, '_pin', lambda p=pin: p)
        assert not backend.pinned_exactly('cpu')


def test_guard_disables_cache_under_the_shared_accelerator_dir():
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', compile_cache_dir('tpu'))
        with host_init_cache_guard():
            assert jax.config.jax_compilation_cache_dir is None
        assert jax.config.jax_compilation_cache_dir == compile_cache_dir('tpu')
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)


def test_guard_is_a_no_op_under_the_host_keyed_cpu_dir():
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', compile_cache_dir('cpu'))
        with host_init_cache_guard():
            assert jax.config.jax_compilation_cache_dir == compile_cache_dir('cpu')
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)


def test_guard_restores_on_exception():
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', compile_cache_dir('tpu'))
        try:
            with host_init_cache_guard():
                raise RuntimeError('boom')
        except RuntimeError:
            pass
        assert jax.config.jax_compilation_cache_dir == compile_cache_dir('tpu')
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)
