"""Python binding for the native packed-record store (LMDB replacement).

The C++ library (`moldiff_tpu/native/record_store.cpp`) mmaps the data file
and serves zero-copy record pointers; this wrapper adds pickle serialization
for molecule dicts (the reference stores pickled PyG Data objects in LMDB,
`/root/reference/utils/dataset.py:117-128`). Builds the .so on first use via
make; falls back to a pure-Python mmap implementation if no compiler.
"""
from __future__ import annotations

import ctypes
import mmap
import os
import pickle
import struct
import subprocess
from typing import Any, Iterator, List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librecord_store.so"))
_MAGIC = 0x4D4F4C4452454331


def _load_native() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR), check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.rs_open.restype = ctypes.c_void_p
    lib.rs_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.rs_count.restype = ctypes.c_int64
    lib.rs_count.argtypes = [ctypes.c_void_p]
    lib.rs_get.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rs_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_uint64)]
    lib.rs_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.rs_close.argtypes = [ctypes.c_void_p]
    lib.rs_writer_open.restype = ctypes.c_void_p
    lib.rs_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.rs_writer_append.restype = ctypes.c_int64
    lib.rs_writer_append.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_uint64]
    lib.rs_writer_close.restype = ctypes.c_int
    lib.rs_writer_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB


def _paths(path: str):
    return path + ".bin", path + ".idx"


class RecordWriter:
    """Append-only record writer. ``append(obj)`` pickles; ``append_bytes``
    stores raw."""

    def __init__(self, path: str):
        data, idx = _paths(path)
        os.makedirs(os.path.dirname(os.path.abspath(data)), exist_ok=True)
        self._native = _lib()
        if self._native is not None:
            self._h = self._native.rs_writer_open(data.encode(), idx.encode())
            if not self._h:
                raise OSError(f"cannot open {data} for writing")
        else:
            self._f = open(data, "wb")
            self._f.write(struct.pack("<Q", _MAGIC))
            self._off = 8
            self._index: List = []
            self._idx_path = idx
        self._count = 0

    def append_bytes(self, b: bytes) -> int:
        if self._native is not None:
            buf = (ctypes.c_uint8 * len(b)).from_buffer_copy(b) if b else None
            r = self._native.rs_writer_append(
                self._h, buf, len(b)
            )
            if r < 0:
                raise OSError("append failed")
        else:
            self._f.write(b)
            self._index.append((self._off, len(b)))
            self._off += len(b)
        self._count += 1
        return self._count - 1

    def append(self, obj: Any) -> int:
        return self.append_bytes(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL))

    def close(self) -> None:
        if self._native is not None:
            if self._native.rs_writer_close(self._h) != 0:
                raise OSError("writer close failed")
            self._h = None
        else:
            self._f.close()
            with open(self._idx_path, "wb") as f:
                f.write(struct.pack("<QQ", _MAGIC, len(self._index)))
                for off, ln in self._index:
                    f.write(struct.pack("<QQ", off, ln))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class RecordReader:
    """mmap'd random-access reader; ``[i]`` unpickles, ``get_bytes`` raw."""

    def __init__(self, path: str):
        data, idx = _paths(path)
        if not (os.path.exists(data) and os.path.exists(idx)):
            raise FileNotFoundError(path)
        self._native = _lib()
        if self._native is not None:
            self._h = self._native.rs_open(data.encode(), idx.encode())
            if not self._h:
                raise OSError(f"cannot open record store {path}")
            self._n = self._native.rs_count(self._h)
        else:
            self._f = open(data, "rb")
            self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
            with open(idx, "rb") as f:
                magic, n = struct.unpack("<QQ", f.read(16))
                assert magic == _MAGIC, "bad index magic"
                raw = f.read(16 * n)
            self._index = [
                struct.unpack_from("<QQ", raw, 16 * i) for i in range(n)
            ]
            self._n = n

    def __len__(self) -> int:
        return int(self._n)

    def get_bytes(self, i: int) -> bytes:
        if not 0 <= i < self._n:
            raise IndexError(i)
        if self._native is not None:
            ln = ctypes.c_uint64()
            ptr = self._native.rs_get(self._h, i, ctypes.byref(ln))
            if not ptr:
                raise OSError(f"corrupt record {i}")
            return ctypes.string_at(ptr, ln.value)
        off, ln = self._index[i]
        return self._mm[off:off + ln]

    def __getitem__(self, i: int) -> Any:
        return pickle.loads(self.get_bytes(i))

    def prefetch(self, lo: int, hi: int) -> None:
        if self._native is not None:
            self._native.rs_prefetch(self._h, lo, hi)

    def __iter__(self) -> Iterator[Any]:
        for i in range(len(self)):
            yield self[i]

    def close(self) -> None:
        if self._native is not None:
            if self._h:
                self._native.rs_close(self._h)
                self._h = None
        else:
            self._mm.close()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def using_native() -> bool:
    return _lib() is not None
