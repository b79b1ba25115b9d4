"""Pure-python reader for torch-serialized files (``.pth``/model-zoo).

The reference initializes ResNet101 from the torchvision model-zoo ``.pth``
(/root/reference/models/modules/backbone/ResNet101.py:58-65).  To avoid a
hard torch dependency in the runtime, this implements the torch zip
serialization format directly: the archive contains ``<name>/data.pkl`` — a
pickle whose tensors are persistent-id references ``('storage', StorageType,
key, location, numel)`` — plus one raw little-endian buffer per storage under
``<name>/data/<key>``.  Tensors are rebuilt as numpy arrays via
``as_strided``.  Falls back to ``torch.load`` for the legacy (non-zip) format
when torch is importable.
"""

import io
import pickle
import zipfile

import numpy as np

_DTYPE_BY_STORAGE = {
    'FloatStorage': np.float32, 'DoubleStorage': np.float64,
    'HalfStorage': np.float16, 'LongStorage': np.int64,
    'IntStorage': np.int32, 'ShortStorage': np.int16,
    'CharStorage': np.int8, 'ByteStorage': np.uint8,
    'BoolStorage': np.bool_, 'BFloat16Storage': None,  # handled specially
}


class _StorageRef:
    __slots__ = ('dtype_name', 'key', 'numel')

    def __init__(self, dtype_name, key, numel):
        self.dtype_name = dtype_name
        self.key = key
        self.numel = numel


class _FakeClass:
    """Stand-in for any torch class referenced by the pickle."""

    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *args, **kwargs):  # e.g. OrderedDict subclass hooks
        return args

    def __repr__(self):
        return f'<fake {self.module}.{self.name}>'


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=None,
                       backward_hooks=None, metadata=None):
    ref, raw = storage
    if ref.dtype_name == 'BFloat16Storage':
        # Widened to f32, so the stride math below in data.dtype.itemsize
        # units is correct for the promoted array.
        u16 = np.frombuffer(raw, dtype=np.uint16)
        data = (u16.astype(np.uint32) << 16).view(np.float32)
    else:
        dtype = _DTYPE_BY_STORAGE[ref.dtype_name]
        data = np.frombuffer(raw, dtype=dtype)
    if not size:
        return data[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        data[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * data.dtype.itemsize for s in stride))
    return np.ascontiguousarray(arr)


_STORAGE_BY_DTYPE = {
    np.dtype(np.float32): 'FloatStorage',
    np.dtype(np.float64): 'DoubleStorage',
    np.dtype(np.float16): 'HalfStorage',
    np.dtype(np.int64): 'LongStorage',
    np.dtype(np.int32): 'IntStorage',
    np.dtype(np.int16): 'ShortStorage',
    np.dtype(np.int8): 'CharStorage',
    np.dtype(np.uint8): 'ByteStorage',
    np.dtype(np.bool_): 'BoolStorage',
}


def _pkl_int(n: int) -> bytes:
    if 0 <= n < 256:
        return b'K' + bytes([n])                     # BININT1
    if -2**31 <= n < 2**31:
        return b'J' + n.to_bytes(4, 'little', signed=True)   # BININT
    data = pickle.encode_long(n)
    return b'\x8a' + bytes([len(data)]) + data       # LONG1


def _pkl_str(s: str) -> bytes:
    raw = s.encode('utf-8')
    return b'X' + len(raw).to_bytes(4, 'little') + raw   # BINUNICODE


def _pkl_global(module: str, name: str) -> bytes:
    return b'c' + module.encode() + b'\n' + name.encode() + b'\n'


def _pkl_tuple(item_bytes) -> bytes:
    return b'(' + b''.join(item_bytes) + b't'


def save_torch_pth(state: dict, filename: str):
    """Write a dict of numpy arrays as a torch-zip ``.pth`` loadable by real
    ``torch.load`` (and by :func:`load_torch_pth`) — hand-emitted pickle
    opcodes referencing torch's rebuild function, no torch import needed."""
    body = [b'\x80\x02', b'}']        # PROTO 2, EMPTY_DICT
    body.append(b'(')                 # MARK for SETITEMS
    storages = {}
    for idx, (name, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _STORAGE_BY_DTYPE:
            raise TypeError("unsupported dtype {} for '{}'".format(arr.dtype, name))
        key = str(idx)
        storages[key] = arr
        body.append(_pkl_str(name))
        # torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)
        body.append(_pkl_global('torch._utils', '_rebuild_tensor_v2'))
        pid = _pkl_tuple([
            _pkl_str('storage'),
            _pkl_global('torch', _STORAGE_BY_DTYPE[arr.dtype]),
            _pkl_str(key),
            _pkl_str('cpu'),
            _pkl_int(arr.size),
        ]) + b'Q'                      # BINPERSID
        strides = tuple(s // arr.itemsize for s in arr.strides) if arr.ndim else ()
        args = _pkl_tuple([
            pid,
            _pkl_int(0),
            _pkl_tuple([_pkl_int(d) for d in arr.shape]),
            _pkl_tuple([_pkl_int(s) for s in strides]),
            b'\x89',                   # NEWFALSE (requires_grad)
            _pkl_global('collections', 'OrderedDict') + b')R',  # empty hooks
        ])
        body.append(args + b'R')       # REDUCE
    body.append(b'u')                  # SETITEMS
    body.append(b'.')                  # STOP
    pkl = b''.join(body)

    with zipfile.ZipFile(filename, 'w', compression=zipfile.ZIP_STORED) as zf:
        zf.writestr('archive/data.pkl', pkl)
        zf.writestr('archive/version', '3\n')
        zf.writestr('archive/byteorder', 'little')
        for key, arr in storages.items():
            zf.writestr('archive/data/{}'.format(key), arr.tobytes())


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file)
        self._read_storage = read_storage

    def persistent_load(self, pid):
        kind = pid[0]
        assert kind == 'storage', f'unknown persistent id {kind}'
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = getattr(storage_type, 'name', None) or getattr(storage_type, '__name__', str(storage_type))
        ref = _StorageRef(name, key, numel)
        return ref, self._read_storage(key)

    def find_class(self, module, name):
        if module == 'torch._utils' and name in ('_rebuild_tensor_v2', '_rebuild_tensor'):
            return _rebuild_tensor_v2
        if module == 'collections' and name == 'OrderedDict':
            return dict
        # numpy's benign data-reconstruction globals (the same set torch's
        # own weights_only unpickler admits): torch.save pickles a stray
        # np.float64 in a checkpoint dict (e.g. a best-mIoU from np.mean)
        # as GLOBAL numpy.core.multiarray scalar + numpy dtype — pure data
        # rebuilds, no code execution surface.
        if name in ('scalar', '_reconstruct') and module in (
                'numpy.core.multiarray', 'numpy._core.multiarray'):
            import numpy.core.multiarray as _ma
            return getattr(_ma, name)
        if module == 'numpy' and name in ('dtype', 'ndarray'):
            import numpy as _np
            return getattr(_np, name)
        if module == '_codecs' and name == 'encode':
            # numpy's scalar payloads pickle their bytes via _codecs.encode.
            import _codecs
            return _codecs.encode
        if module.startswith('torch'):
            fake = _FakeClass(module, name)
            fake.name = name
            return fake
        # NEVER delegate to the default resolver: .pth files are untrusted
        # input (any --weights/--init-weights path routes here), and pickle
        # GLOBAL+REDUCE on an arbitrary importable (os.system, ...) executes
        # at load time.  A real state dict needs nothing outside torch.*
        # and OrderedDict.
        raise pickle.UnpicklingError(
            "refusing to resolve {}.{} from a .pth file (only torch tensor "
            "rebuilds and OrderedDict are allowed)".format(module, name))


def load_torch_pth(filename):
    """Load a torch-saved file into a dict of numpy arrays."""
    try:
        with zipfile.ZipFile(filename, 'r') as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith('/data.pkl') or n == 'data.pkl')
            prefix = pkl_name[:-len('data.pkl')]

            def read_storage(key):
                return zf.read(f'{prefix}data/{key}')

            with zf.open(pkl_name) as f:
                return _TorchUnpickler(io.BytesIO(f.read()), read_storage).load()
    except (zipfile.BadZipFile, StopIteration):
        pass
    # Legacy torch format: delegate to torch if present.
    try:
        import torch  # noqa
    except ImportError as exc:
        raise RuntimeError(
            "'{}' is a legacy torch pickle; reading it requires torch".format(filename)) from exc
    # weights_only=True: same untrusted-input rule as find_class above —
    # the legacy path must not become the pickle-execution loophole.
    state = torch.load(filename, map_location='cpu', weights_only=True)
    return {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in state.items()}
