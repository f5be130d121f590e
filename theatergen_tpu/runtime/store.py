"""ctypes bindings for the native embedding store (native/theaterstore.cpp).

Builds the shared library on first use (g++, cached beside the source);
falls back cleanly if no compiler is available — callers must check
:func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "theaterstore.cpp")
_SO = os.path.join(_ROOT, "native", "libtheaterstore.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # corrupt / wrong-arch .so: fall back cleanly per contract
            _build_failed = True
            return None
        lib.ts_open.restype = ctypes.c_void_p
        lib.ts_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.ts_dim.restype = ctypes.c_uint32
        lib.ts_dim.argtypes = [ctypes.c_void_p]
        lib.ts_count.restype = ctypes.c_uint64
        lib.ts_count.argtypes = [ctypes.c_void_p]
        lib.ts_put.restype = ctypes.c_int
        lib.ts_put.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_float)]
        lib.ts_get.restype = ctypes.c_int
        lib.ts_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_float)]
        lib.ts_has.restype = ctypes.c_int
        lib.ts_has.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ts_delete.restype = ctypes.c_int
        lib.ts_delete.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ts_keys.restype = ctypes.c_uint64
        lib.ts_keys.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int64)]
        lib.ts_close.restype = None
        lib.ts_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class EmbeddingStore:
    """Keyed float32-vector store backed by the native library."""

    def __init__(self, path: str, dim: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native theaterstore unavailable (no g++?)")
        self._lib = lib
        self.dim = dim
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._h = lib.ts_open(path.encode(), dim)
        if not self._h:
            raise IOError(f"cannot open embedding store {path!r}")

    def _check_open(self) -> None:
        if not self._h:
            raise ValueError("EmbeddingStore is closed")

    def put(self, key: int, vec: np.ndarray) -> None:
        self._check_open()
        v = np.ascontiguousarray(vec, np.float32)
        assert v.shape == (self.dim,), (v.shape, self.dim)
        ok = self._lib.ts_put(
            self._h, int(key), v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if not ok:
            raise IOError("ts_put failed")

    def get(self, key: int) -> Optional[np.ndarray]:
        self._check_open()
        out = np.empty(self.dim, np.float32)
        ok = self._lib.ts_get(
            self._h, int(key),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out if ok else None

    def __contains__(self, key: int) -> bool:
        self._check_open()
        return bool(self._lib.ts_has(self._h, int(key)))

    def delete(self, key: int) -> bool:
        self._check_open()
        return bool(self._lib.ts_delete(self._h, int(key)))

    def keys(self) -> List[int]:
        self._check_open()
        n = self._lib.ts_count(self._h)
        buf = np.empty(max(int(n), 1), np.int64)
        got = self._lib.ts_keys(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return sorted(int(k) for k in buf[: int(got)])

    def __len__(self) -> int:
        self._check_open()
        return int(self._lib.ts_count(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
