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

    blob1 = fsutil._live_cpuid_identity()
    blob2 = fsutil._live_cpuid_identity()
    assert blob1 == blob2  # per-core noise (APIC ID) must be masked out
    if platform.machine() == 'x86_64':
        assert blob1, "CPUID probe must work on x86_64"
        # Leaf 0 carries the vendor string in EBX/EDX/ECX.
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
