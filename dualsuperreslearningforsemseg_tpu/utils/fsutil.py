"""Filesystem and misc helpers (parity: /root/reference/utils.py:193-260)."""

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


def prevent_system_sleep():
    """Keep the machine awake during long runs (Windows only, like the
    reference /root/reference/utils.py:217-226; a no-op elsewhere)."""
    if platform.system() == 'Windows':
        ES_CONTINUOUS = 0x80000000
        ES_SYSTEM_REQUIRED = 0x00000001
        return ctypes.windll.kernel32.SetThreadExecutionState(ES_CONTINUOUS | ES_SYSTEM_REQUIRED) != 0
    return False
