"""Restricted unpickler for torch-format checkpoints (reference
gyre/torch_safe_unpickler.py:17-79: allowlist-based unpickling so untrusted
.ckpt/.pt uploads can't execute code). Prefer safetensors everywhere; this
exists only for legacy LDM/TI files."""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

_ALLOWED = {
    ("collections", "OrderedDict"),
    ("builtins", "dict"), ("builtins", "list"), ("builtins", "tuple"),
    ("builtins", "set"), ("builtins", "int"), ("builtins", "float"),
    ("builtins", "str"), ("builtins", "bytes"), ("builtins", "complex"),
    ("torch._utils", "_rebuild_tensor_v2"),
    ("torch._utils", "_rebuild_tensor"),
    ("torch", "FloatStorage"), ("torch", "HalfStorage"),
    ("torch", "BFloat16Storage"), ("torch", "IntStorage"),
    ("torch", "LongStorage"), ("torch", "ByteStorage"),
    ("torch", "BoolStorage"), ("torch", "DoubleStorage"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy", "ndarray"), ("numpy", "dtype"),
    ("_codecs", "encode"),
}

_STORAGE_DTYPES = {
    "FloatStorage": np.float32, "HalfStorage": np.float16,
    "BFloat16Storage": np.float32,  # upcast; numpy has no bf16
    "IntStorage": np.int32, "LongStorage": np.int64,
    "ByteStorage": np.uint8, "BoolStorage": np.bool_,
    "DoubleStorage": np.float64,
}


class _StorageRef:
    def __init__(self, dtype, key):
        self.dtype = dtype
        self.key = key
        self.data: np.ndarray | None = None


class _Tensor:
    """Minimal stand-in reconstructing to a numpy array."""

    def __init__(self, storage: _StorageRef, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def to_numpy(self) -> np.ndarray:
        flat = self.storage.data
        n = int(np.prod(self.size)) if self.size else 1
        arr = flat[self.offset:self.offset + max(n, 1)]
        try:
            return np.lib.stride_tricks.as_strided(
                flat[self.offset:],
                shape=self.size,
                strides=tuple(s * flat.itemsize for s in self.stride)).copy()
        except Exception:  # noqa: BLE001
            return arr.reshape(self.size)


def _rebuild_tensor_v2(storage, offset, size, stride, *_args):
    return _Tensor(storage, offset, size, stride)


class SafeUnpickler(pickle.Unpickler):
    def __init__(self, fh, storages):
        super().__init__(fh)
        self._storages = storages

    def find_class(self, module, name):
        if (module, name) not in _ALLOWED:
            raise pickle.UnpicklingError(
                f"blocked unpickle of {module}.{name}")
        if name == "_rebuild_tensor_v2" or name == "_rebuild_tensor":
            return _rebuild_tensor_v2
        if module == "torch" and name.endswith("Storage"):
            return name  # marker consumed by persistent_load
        return super().find_class(module, name)

    def persistent_load(self, pid):
        # torch zip format: ('storage', StorageType, key, location, numel)
        if isinstance(pid, tuple) and pid and pid[0] == "storage":
            _, stype, key, _loc, _numel = pid
            name = stype if isinstance(stype, str) else stype.__name__
            ref = _StorageRef(_STORAGE_DTYPES.get(name, np.float32), key)
            ref.storage_name = name
            self._storages.append(ref)
            return ref
        raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")


def load_torch_checkpoint(data: bytes) -> dict:
    """torch.save zip archive bytes -> {key: np.ndarray} (nested dicts
    preserved; tensors become numpy)."""
    storages: list[_StorageRef] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
        root = pkl_name.rsplit("/", 1)[0]
        obj = SafeUnpickler(io.BytesIO(zf.read(pkl_name)), storages).load()
        for ref in storages:
            raw = zf.read(f"{root}/data/{ref.key}")
            if getattr(ref, "storage_name", "") == "BFloat16Storage":
                bits = np.frombuffer(raw, dtype=np.uint16).astype(np.uint32)
                ref.data = (bits << 16).view(np.float32)
            elif getattr(ref, "storage_name", "") == "HalfStorage":
                ref.data = np.frombuffer(raw, np.float16).astype(np.float32)
            else:
                ref.data = np.frombuffer(raw, dtype=ref.dtype)

    def resolve(node):
        if isinstance(node, _Tensor):
            return node.to_numpy()
        if isinstance(node, dict):
            return {k: resolve(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(resolve(v) for v in node)
        return node

    return resolve(obj)
