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
        u16 = np.frombuffer(raw, dtype=np.uint16)
        data = (u16.astype(np.uint32) << 16).view(np.float32)
        itemsize = 2
    else:
        dtype = _DTYPE_BY_STORAGE[ref.dtype_name]
        data = np.frombuffer(raw, dtype=dtype)
        itemsize = data.dtype.itemsize
    del itemsize
    if not size:
        return data[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        data[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * data.dtype.itemsize for s in stride))
    return np.ascontiguousarray(arr)


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
        if module.startswith('torch'):
            fake = _FakeClass(module, name)
            fake.name = name
            return fake
        return super().find_class(module, name)


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
    state = torch.load(filename, map_location='cpu', weights_only=False)
    return {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in state.items()}
