"""Filesystem and misc helpers (parity: /root/reference/utils.py:193-260)."""

import contextlib
import ctypes
import os
import os.path
import platform

INVALID_FILENAME_CHARS = ('<', '>', ':', '"', '/', '\\', '|', '?')


def isInvalidFilename(filename):
    return any(c in filename for c in INVALID_FILENAME_CHARS)


def getFilesWithExtension(dir_, extension_or_tuple, with_path=False):
    if not isinstance(extension_or_tuple, tuple):
        extension_or_tuple = (extension_or_tuple,)
    extension_or_tuple = tuple(x.casefold() for x in extension_or_tuple)
    return [(os.path.join(dir_, f) if with_path else f)
            for f in sorted(os.listdir(dir_))
            if f.casefold().endswith(extension_or_tuple)]


def hasExtension(filename, extension):
    return os.path.splitext(filename)[-1].casefold() == extension.casefold()


def swapTupleValues(t):
    assert type(t) in [tuple, list] and len(t) == 2, "Only tuple of size 2 is supported!"
    return type(t)((t[1], t[0]))


def check_version(version, major, minor):
    if isinstance(version, str):
        version = tuple(int(x) for x in version.split('.')[:2])
    return (version[0], version[1]) >= (major, minor)


def compile_cache_dir(backend: str) -> str:
    """Persistent XLA compile-cache directory for ``backend`` ('tpu'/'cpu').

    TPU programs are compiled by the (remote) TPU service, so one shared
    directory is safe.  XLA:CPU entries are AOT *machine code* keyed only by
    the program: an entry written on a different host loads with mismatched
    ISA features (XLA only logs an error) and has been observed to produce
    wrong numerics and SIGABRT here, so the CPU directory is keyed by the
    host's CPU feature set."""
    if backend != 'cpu':
        # Any accelerator backend (tpu / the axon plugin name): device code,
        # host-independent.
        return '/tmp/dsrl_tpu_jax_cache'
    # The key must cover everything LLVM derives host codegen from.  Flags
    # alone are NOT enough: two hosts with identical cpuinfo flags but
    # different family/model/stepping get different getHostCPUName() answers,
    # and with them different *tuning* features (+prefer-no-scatter,
    # +prefer-no-gather, -amx-avx512, ...) baked into the AOT entry — observed
    # here as cross-loads that XLA only E-logs.  Hash the identity fields too.
    import hashlib
    keys = ('vendor_id', 'cpu family', 'model', 'model name', 'stepping',
            'microcode', 'flags')
    ident = []
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if not line.strip():
                    break  # first processor block only
                if line.split(':')[0].strip() in keys:
                    ident.append(line.strip())
    except OSError:
        pass
    if not ident:
        ident = [platform.processor() or 'unknown']
    tag = hashlib.md5('\n'.join(ident).encode()).hexdigest()[:10]
    return '/tmp/dsrl_tpu_jax_cache_cpu_' + tag


@contextlib.contextmanager
def host_init_cache_guard():
    """Disable the persistent compile cache around host-CPU param init.

    A TPU process points the cache at the shared, host-independent directory
    (TPU executables travel fine between hosts).  But initializing params on
    the host CPU backend inside that process writes XLA:CPU *AOT machine
    code* into the same directory — and a later run on a different host
    loads it with mismatched ISA features (the cpu_aot_loader E-logs seen in
    driver bench tails).  Host init is a handful of tiny kernels; skipping
    the cache for them costs nothing and removes the hazard.  When the
    active directory is already the host-keyed CPU one (CPU-only runs,
    the test suite), caching is safe and left untouched."""
    import jax
    prev = jax.config.jax_compilation_cache_dir
    if not prev or prev == compile_cache_dir('cpu'):
        yield
        return
    jax.config.update('jax_compilation_cache_dir', None)
    try:
        yield
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)


def prevent_system_sleep():
    """Keep the machine awake during long runs (Windows only, like the
    reference /root/reference/utils.py:217-226; a no-op elsewhere)."""
    if platform.system() == 'Windows':
        ES_CONTINUOUS = 0x80000000
        ES_SYSTEM_REQUIRED = 0x00000001
        return ctypes.windll.kernel32.SetThreadExecutionState(ES_CONTINUOUS | ES_SYSTEM_REQUIRED) != 0
    return False
