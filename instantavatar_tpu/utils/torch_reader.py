"""Torch-free reader for PyTorch serialization files.

Reads ``.pth``/``.pt`` checkpoints into plain numpy arrays without
importing torch — needed to extract the reference's bundled LPIPS head
weights (/root/reference/third_parties/lpips/weights/v0.1/*.pth, legacy
tar-less format) and to ingest user-provided torchvision trunk weights
(modern zip format) in environments where torch is absent.

Two on-disk formats are handled:

* **legacy** (pre-1.6): a stream of pickles — magic number, protocol
  version, sys info, the object graph (tensors reference storages through
  ``persistent_id`` tuples), the list of storage keys, then each storage's
  raw bytes prefixed by an int64 element count.
* **zip** (1.6+): a zipfile with ``data.pkl`` (object graph) and one file
  per storage under ``data/``.

Only plain CPU tensors are supported (no sparse/quantized/cuda), which
covers every state-dict this project consumes.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any

import numpy as np

__all__ = ["load_torch_weights"]

_MAGIC = 0x1950A86A20F9469CFC6C

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": np.uint16,  # no native bf16 in numpy; raw bits
}


class _StorageRef:
    """Placeholder for a torch storage; filled with bytes after unpickling
    (legacy) or immediately (zip)."""

    def __init__(self, dtype: np.dtype, key: str, numel: int | None):
        self.dtype = np.dtype(dtype)
        self.key = key
        self.numel = numel
        self.data: bytes | None = None

    def array(self) -> np.ndarray:
        return np.frombuffer(self.data, dtype=self.dtype)


class _FakeTensor:
    """Stand-in for torch.Tensor rebuilt via _rebuild_tensor_v2."""

    def __init__(self, storage: _StorageRef, offset: int,
                 size: tuple, stride: tuple):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def to_numpy(self) -> np.ndarray:
        flat = self.storage.array()
        if not self.size:
            return flat[self.offset].copy()
        return np.lib.stride_tricks.as_strided(
            flat[self.offset:],
            shape=self.size,
            strides=tuple(s * flat.itemsize for s in self.stride)).copy()


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    return _FakeTensor(storage, storage_offset, tuple(size), tuple(stride))


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _Dict(dict):
    """dict that tolerates pickle BUILD state (OrderedDict stand-in)."""

    def __setstate__(self, state):
        # torch state dicts attach {'_metadata': ...} as attribute state;
        # drop it (torch.load keeps it off the mapping too)
        pass


class _StubClass:
    """Catch-all for torch classes we don't model (OrderedDict subclasses
    etc.) — behaves like a dict when instantiated via REDUCE."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        pass


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, storages: dict[str, _StorageRef]):
        super().__init__(f, encoding="latin1")
        self.storages = storages

    def find_class(self, module: str, name: str):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_tensor":
            return lambda storage, offset, size, stride: \
                _rebuild_tensor_v2(storage, offset, size, stride)
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "collections" and name == "OrderedDict":
            return _Dict
        if name in _DTYPES:  # torch.FloatStorage etc. used as type tags
            return name
        return _StubClass

    def persistent_load(self, pid: Any):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type if isinstance(storage_type, str) \
            else getattr(storage_type, "__name__", str(storage_type))
        if name not in _DTYPES:
            raise pickle.UnpicklingError(f"unsupported storage {name}")
        if key not in self.storages:
            self.storages[key] = _StorageRef(_DTYPES[name], key, numel)
        return self.storages[key]


def _tensors_to_numpy(obj):
    if isinstance(obj, _FakeTensor):
        return obj.to_numpy()
    if isinstance(obj, dict):
        return {k: _tensors_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_tensors_to_numpy(v) for v in obj)
    return obj


def _load_legacy(f) -> Any:
    storages: dict[str, _StorageRef] = {}
    magic = pickle.load(f)
    if magic != _MAGIC:
        raise ValueError("not a legacy torch file (bad magic)")
    pickle.load(f)   # protocol version
    pickle.load(f)   # sys info
    obj = _Unpickler(f, storages).load()
    keys = pickle.load(f)
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        ref = storages[key]
        ref.data = f.read(numel * ref.dtype.itemsize)
    return _tensors_to_numpy(obj)


def _load_zip(path: str) -> Any:
    storages: dict[str, _StorageRef] = {}
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        obj = _Unpickler(io.BytesIO(zf.read(pkl_name)), storages).load()
        for key, ref in storages.items():
            ref.data = zf.read(f"{prefix}data/{key}")
    return _tensors_to_numpy(obj)


def load_torch_weights(path: str) -> Any:
    """Load a torch checkpoint as nested numpy arrays (no torch needed)."""
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    with open(path, "rb") as f:
        return _load_legacy(f)
