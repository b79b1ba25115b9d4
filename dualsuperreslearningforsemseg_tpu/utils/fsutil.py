"""Filesystem and misc helpers (parity: /root/reference/utils.py:193-260)."""

import contextlib
import ctypes
import functools
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


@functools.lru_cache(maxsize=1)
def _live_cpuid_identity():
    """Raw CPUID dump read at RUNTIME — the same source LLVM's
    getHostCPUName()/getHostCPUFeatures() use for host codegen.

    /proc/cpuinfo is a BOOT-TIME snapshot: after a live VM migration it
    still describes the original physical host while the cpuid instruction
    answers for the new one, so two machines can present identical cpuinfo
    yet get different LLVM tuning (+prefer-no-gather, ...) — observed here
    as a cpu_aot_loader feature-mismatch E-log from a cache directory keyed
    by cpuinfo alone.  Executes cpuid/xgetbv from a tiny mmap'd code page;
    returns b'' off x86_64 or when W^X policy blocks the page.
    """
    if platform.machine() != 'x86_64':
        return b''
    try:
        import mmap
        # SysV x86-64: void f(uint32_t out[5], uint32_t leaf, uint32_t sub)
        #   rdi = out, esi = leaf, edx = subleaf
        cpuid_code = (
            b"\x53"                  # push %rbx
            b"\x89\xf0"              # mov  %esi,%eax
            b"\x89\xd1"              # mov  %edx,%ecx
            b"\x0f\xa2"              # cpuid
            b"\x89\x07"              # mov  %eax,(%rdi)
            b"\x89\x5f\x04"          # mov  %ebx,0x4(%rdi)
            b"\x89\x4f\x08"          # mov  %ecx,0x8(%rdi)
            b"\x89\x57\x0c"          # mov  %edx,0xc(%rdi)
            b"\x5b"                  # pop  %rbx
            b"\xc3")                 # ret
        # void g(uint32_t out[2]): xgetbv(0) — OS-enabled AVX/AVX512 state,
        # the other half of LLVM's feature detection.
        xgetbv_code = (
            b"\x31\xc9"              # xor  %ecx,%ecx
            b"\x0f\x01\xd0"          # xgetbv
            b"\x89\x07"              # mov  %eax,(%rdi)
            b"\x89\x57\x04"          # mov  %edx,0x4(%rdi)
            b"\xc3")                 # ret
        buf = mmap.mmap(-1, mmap.PAGESIZE,
                        prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(cpuid_code)
        xgetbv_off = len(cpuid_code)
        buf.seek(xgetbv_off)
        buf.write(xgetbv_code)
        base = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        cpuid = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_uint32),
                                 ctypes.c_uint32, ctypes.c_uint32)(base)
        xgetbv = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_uint32))(
            base + xgetbv_off)
        out = (ctypes.c_uint32 * 4)()
        dump = []
        # Identity + feature leaves LLVM consults: basic 0/1/7(0,1)/0xD(0,1),
        # extended 0x80000001/8.  Excluded on purpose: the name-string
        # leaves 0x80000002..4 (the marketing string is already in cpuinfo
        # and can carry per-VM noise) and the cache-descriptor leaf
        # 0x80000006 (per-core-type on hybrid parts — key-splintering noise,
        # and LLVM feature detection does not consume it).
        for leaf, sub in ((0, 0), (1, 0), (7, 0), (7, 1),
                          (0xD, 0), (0xD, 1),
                          (0x80000000, 0), (0x80000001, 0), (0x80000008, 0)):
            cpuid(out, leaf, sub)
            regs = list(out)
            if leaf == 1:
                # EBX[31:24] is the initial APIC ID of the executing core —
                # per-core noise that would splinter the key on one host.
                regs[1] &= 0x00FFFFFF
            dump.append((leaf, sub) + tuple(regs))
        xcr = (ctypes.c_uint32 * 2)()
        if dump[1][2 + 2] & (1 << 27):  # leaf1 ECX.OSXSAVE: xgetbv is legal
            xgetbv(xcr)
        dump.append(('xcr0', tuple(xcr)))
        del cpuid, xgetbv  # release from_buffer refs before the page goes
        return repr(dump).encode()
    except Exception:
        return b''


def compile_cache_dir(backend: str) -> str:
    """Persistent XLA compile-cache directory for ``backend`` ('tpu'/'cpu').

    TPU programs are compiled by the (remote) TPU service, so one shared
    directory is safe.  XLA:CPU entries are AOT *machine code* keyed only by
    the program: an entry written on a different host loads with mismatched
    ISA features (XLA only logs an error) and has been observed to produce
    wrong numerics and SIGABRT here, so the CPU directory is keyed by the
    host's CPU identity."""
    if backend != 'cpu':
        # Any accelerator backend (tpu / the axon plugin name): device code,
        # host-independent.
        return '/tmp/dsrl_tpu_jax_cache'
    # The key must cover everything LLVM derives host codegen from, read
    # from the same place LLVM reads it: live CPUID (see
    # _live_cpuid_identity — cpuinfo survives live migration unchanged and
    # has collided across hosts with different LLVM tuning features).
    # cpuinfo fields stay in the hash as the fallback and for microcode.
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
    blob = '\n'.join(ident).encode() + b'\0' + _live_cpuid_identity()
    tag = hashlib.md5(blob).hexdigest()[:10]
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
