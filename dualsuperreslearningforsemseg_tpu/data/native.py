"""ctypes bindings for the native C++ data plane (native/dataplane.cpp).

Loads ``native/libdsrl_dataplane.so``; builds it with ``make`` on first use
if the toolchain is present; degrades silently to the PIL path otherwise.
"""

import ctypes
import os
import os.path
import subprocess
import threading

import numpy as np

from ..utils.logging import CAUTION

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libdsrl_dataplane.so')

_lib = None
_lib_lock = threading.Lock()
_warned = False
_last_build_error = None   # last _try_build failure, for the degrade CAUTION

# Must match dp_version() in native/dataplane.cpp.  A stale .so triggers a
# rebuild; if the rebuild fails (no toolchain on this host), a lib whose CORE
# ABI is intact still loads so decode+warp keep running at native speed —
# only the optional features degrade (v4 label plane: its in-graph fallback
# in train/steps.py costs ~7 ms/step, vs ~320 ms/step for losing the whole
# warp path; v5 indexed decode errors: messages lose the failing filename).
# Callers must gate optional symbols via has_g16_labels()/hasattr, never
# assume them from native_available().
_EXPECTED_VERSION = 5
# Core ABI, unchanged since v2 (decode + affine warp).
_MIN_CORE_VERSION = 2
_CORE_SYMBOLS = ('dp_version', 'dp_decode_png', 'dp_decode_pair_batch',
                 'dp_warp_pair_batch')

# dataplane.cpp error codes (DecodeResult.error + batch-level 7).
_ERROR_NAMES = {1: 'open failed', 2: 'not a PNG', 3: 'decode failed',
                4: 'output buffer overflow', 5: 'malformed filter byte',
                6: 'allocation failure', 7: 'unexpected dimensions'}
# Pre-v5 libraries (the documented stale-core degrade path) used 5 as the
# batch-level catch-all — naming it 'malformed filter byte' there would
# send users hunting for PNG corruption when the common cause is a
# resolution mismatch.
_LEGACY_ERROR_NAMES = dict(_ERROR_NAMES)
_LEGACY_ERROR_NAMES[5] = ('decode error (stale pre-v5 library: dimension '
                          'mismatch or malformed filter byte)')


def _try_build(force=False):
    # force=True remakes unconditionally (make -B): a stale .so copied in
    # with an mtime newer than dataplane.cpp turns the plain `make` into a
    # no-op.  On a failed relink make leaves the old .so in place, so the
    # stale-core fallback below still works.
    #
    # Cross-PROCESS exclusion: _lib_lock only serializes threads in one
    # interpreter, but multi-process launches (world_size ranks on one host,
    # parallel CLI invocations) all reach this make together and the linker
    # writes the .so in place — a sibling would dlopen a truncated file and
    # silently drop to the PIL path for its whole run.  An flock on a
    # sidecar lockfile makes the build+link critical section exclusive; the
    # Makefile additionally links via a tempfile + atomic rename so even a
    # reader that skips this function (fresh-looking .so) never maps a
    # partial image.
    global _last_build_error
    cmd = ['make', '-B', '-C', _NATIVE_DIR] if force else \
          ['make', '-C', _NATIVE_DIR]
    try:
        import fcntl
        with open(os.path.join(_NATIVE_DIR, '.build.lock'), 'w') as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        _last_build_error = None
        return True
    except subprocess.CalledProcessError as exc:
        # Keep the actual compiler/linker complaint for the degrade CAUTION:
        # "no toolchain" was the message for EVERY failure mode (missing
        # headers, lock on a read-only checkout, timeout, ...), sending
        # users down the wrong path while the run silently pays ~12x per
        # decode on PIL.
        tail = (exc.stderr or b'').decode(errors='replace').strip().splitlines()
        _last_build_error = 'make exited {}: {}'.format(
            exc.returncode, tail[-1] if tail else 'no stderr')
        return False
    except Exception as exc:
        _last_build_error = '{}: {}'.format(type(exc).__name__, exc)
        return False


def _dlclose(lib):
    # Drop the handle so a rebuilt .so at the same path dlopen()s fresh
    # (glibc caches dlopen by pathname while a handle is live).
    try:
        import _ctypes
        _ctypes.dlclose(lib._handle)
    except Exception:
        pass


def _load_and_check():
    """CDLL the .so and validate the core ABI; returns the bound lib or None.

    Optional features (dp_labels_g16_t, v4) are bound when present; callers
    check has_g16_labels()."""
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    if not all(hasattr(lib, s) for s in _CORE_SYMBOLS):
        _dlclose(lib)
        return None
    lib.dp_version.restype = ctypes.c_int
    if lib.dp_version() < _MIN_CORE_VERSION:
        _dlclose(lib)
        return None
    lib.dp_decode_png.restype = ctypes.c_int
    lib.dp_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.dp_decode_pair_batch.restype = ctypes.c_int
    lib.dp_decode_pair_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    lib.dp_warp_pair_batch.restype = ctypes.c_int
    lib.dp_warp_pair_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_char_p, ctypes.c_int]
    if hasattr(lib, 'dp_labels_g16_t'):  # optional, v4
        lib.dp_labels_g16_t.restype = ctypes.c_int
        lib.dp_labels_g16_t.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    if hasattr(lib, 'dp_decode_pair_batch2'):  # optional, v5
        lib.dp_decode_pair_batch2.restype = ctypes.c_int
        lib.dp_decode_pair_batch2.argtypes = \
            lib.dp_decode_pair_batch.argtypes + [ctypes.POINTER(ctypes.c_int)]
    return lib


def _is_current(lib) -> bool:
    return lib is not None and lib.dp_version() >= _EXPECTED_VERSION


def get_lib():
    """The loaded native library, or None if unavailable.

    A stale-but-core-intact library triggers a rebuild attempt; if the
    rebuild fails the stale library is still used (decode+warp at native
    speed, optional features gated off) rather than dropping the whole
    data plane to the PIL fallback."""
    global _lib, _warned
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        lib = _load_and_check() if os.path.isfile(_SO_PATH) else None
        if not _is_current(lib):
            if lib is not None:
                _dlclose(lib)
                lib = None
            built = _try_build()
            if built:
                lib = _load_and_check()
            if built and not _is_current(lib):
                # The plain make SUCCEEDED yet the lib is stale or would not
                # even load: it no-op'd against a newer-mtime bad/stale .so,
                # so remake unconditionally.  (When the plain make FAILED,
                # retrying with -B would just pay the build timeout twice.)
                if lib is not None:
                    _dlclose(lib)
                    lib = None
                if _try_build(force=True):
                    lib = _load_and_check()
            if lib is None and os.path.isfile(_SO_PATH):
                lib = _load_and_check()  # fall back to the stale core ABI
            if lib is not None and not _is_current(lib) and not _warned:
                print(CAUTION("Native data plane is stale (v{} < v{}) and "
                              "would not rebuild; using its core decode/"
                              "warp path with newer features disabled."
                              .format(lib.dp_version(), _EXPECTED_VERSION)))
                _warned = True
        if lib is None:
            if not _warned:
                detail = _last_build_error or 'library failed its ABI check'
                print(CAUTION("Native data plane unavailable ({}); falling "
                              "back to PIL decode. `make -C native` shows "
                              "the full build output.".format(detail)))
                _warned = True
            _lib = False
            return None
        _lib = lib
        return lib


def native_available() -> bool:
    return get_lib() is not None


def has_g16_labels() -> bool:
    """True when the loaded library exports the optional v4 label plane."""
    lib = get_lib()
    return lib is not None and hasattr(lib, 'dp_labels_g16_t')


def _default_threads():
    # CPU-bound native loops: more threads than cores only thrashes.
    return max(1, min(8, os.cpu_count() or 8))


def decode_pair_batch(img_paths, seg_paths, size_hw, lut=None, threads=None):
    """Decode n (image, labelIds) PNG pairs into batched uint8 arrays.

    Returns (imgs (n,h,w,3) u8, segs (n,h,w) u8) or raises RuntimeError with
    the native error code.  ``lut``: optional 256-entry uint8 label LUT
    applied in the decode pass (fused 34->19 translation)."""
    lib = get_lib()
    assert lib is not None, "native data plane not available"
    n = len(img_paths)
    h, w = size_hw
    imgs = np.empty((n, h, w, 3), dtype=np.uint8)
    segs = np.empty((n, h, w), dtype=np.uint8)
    c_imgs = (ctypes.c_char_p * n)(*[p.encode() for p in img_paths])
    c_segs = (ctypes.c_char_p * n)(*[p.encode() for p in seg_paths])
    lut_arg = None
    if lut is not None:
        lut = np.ascontiguousarray(lut, dtype=np.uint8)
        assert lut.size == 256
        lut_arg = lut.tobytes()
    nthreads = threads if threads is not None else _default_threads()
    out_args = (c_imgs, c_segs, n,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                segs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                h, w, lut_arg, nthreads)
    if hasattr(lib, 'dp_decode_pair_batch2'):
        bad = ctypes.c_int(-1)
        err = lib.dp_decode_pair_batch2(*out_args, ctypes.byref(bad))
        bad_index = bad.value
        names = _ERROR_NAMES
    else:  # stale-core library: no failing-pair identity, old code meanings
        err = lib.dp_decode_pair_batch(*out_args)
        bad_index = -1
        names = _LEGACY_ERROR_NAMES
    if err != 0:
        what = names.get(err, 'error')
        where = '' if bad_index < 0 else " on pair ({!r}, {!r})".format(
            img_paths[bad_index], seg_paths[bad_index])
        raise RuntimeError("native decode failed with code {} ({}){}"
                           .format(err, what, where))
    return imgs, segs


def warp_pair_batch(imgs, segs, matrices, out_hw, lut=None, threads=None):
    """Affine-warp a batch on the host: bilinear for images (fill 0), nearest
    + optional LUT for labels (fill 255).

    Args:
      imgs: (n, H0, W0, 3) u8; segs: (n, H0, W0) u8.
      matrices: (n, 2, 3) f32 mapping output pixel -> source coords.
      out_hw: (OH, OW).
    Returns (imgs_w (n,OH,OW,3) u8, segs_w (n,OH,OW) u8).
    """
    lib = get_lib()
    assert lib is not None and hasattr(lib, 'dp_warp_pair_batch'), \
        "native warp not available"
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    segs = np.ascontiguousarray(segs, dtype=np.uint8)
    n, h0, w0 = segs.shape
    # The C++ worker derives every stride from segs' geometry; a mismatched
    # image batch would read far out of bounds, not error.
    assert imgs.shape == (n, h0, w0, 3), (imgs.shape, segs.shape)
    oh, ow = out_hw
    mats = np.ascontiguousarray(matrices, dtype=np.float32).reshape(n * 6)
    imgs_out = np.empty((n, oh, ow, 3), dtype=np.uint8)
    segs_out = np.empty((n, oh, ow), dtype=np.uint8)
    lut_arg = None
    if lut is not None:
        lut = np.ascontiguousarray(lut, dtype=np.uint8)
        assert lut.size == 256
        lut_arg = lut.tobytes()
    err = lib.dp_warp_pair_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h0, w0,
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow,
        imgs_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        segs_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lut_arg, threads if threads is not None else _default_threads())
    if err != 0:
        raise RuntimeError("native warp failed with code {}".format(err))
    return imgs_out, segs_out


def labels_g16_t(segs, threads=None):
    """Re-layout warped label maps into the fused tail kernel's operand.

    Args:
      segs: (n, OH, OW) u8 warped+LUT'd labels (OH, OW multiples of 4).
    Returns (16, n*(OH/4)*(OW/4)) u8 — row g16 = nested group index,
    columns in plain (b, y, x) pixel order (matches
    ops/conv.py::group_labels_g16_t; done here because the same
    permutation inside the XLA train program costs ~7 ms/step of device
    time, while this host pass overlaps with device compute).
    """
    lib = get_lib()
    assert lib is not None and hasattr(lib, 'dp_labels_g16_t'), \
        "native label layout not available"
    segs = np.ascontiguousarray(segs, dtype=np.uint8)
    n, oh, ow = segs.shape
    out = np.empty((16, n * (oh // 4) * (ow // 4)), dtype=np.uint8)
    err = lib.dp_labels_g16_t(
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads if threads is not None else _default_threads())
    if err != 0:
        raise RuntimeError("native label layout failed with code {}".format(err))
    return out
