"""Native (C++) host components, loaded via ctypes.

Build-on-first-import with g++ (no pybind11 in the image; the CPython
boundary is a plain C ABI). The compiled .so is cached next to the
source keyed by a content hash, so editing packer.cpp triggers a
rebuild. Everything degrades gracefully: `native_available()` is False
when no toolchain exists and callers fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_packer_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.packer_new.restype = ctypes.c_void_p
    lib.packer_new.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.packer_feed.restype = None
    lib.packer_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.packer_ready.restype = ctypes.c_int64
    lib.packer_ready.argtypes = [ctypes.c_void_p]
    lib.packer_next.restype = ctypes.c_int32
    lib.packer_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.packer_buffered.restype = ctypes.c_int64
    lib.packer_buffered.argtypes = [ctypes.c_void_p]
    lib.packer_free.restype = None
    lib.packer_free.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


class ByteStreamPacker:
    """Streaming byte tokenizer + fixed-length packer (C++ backed).

    feed(text_or_bytes) buffers tokens; next_batch() returns a
    [batch, seq_len+1] int32 array or None. Identical packing semantics
    to train.data.pack_token_stream (verified by test_native_packer).
    """

    def __init__(self, seq_len: int, batch_size: int):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native packer unavailable (no g++?)")
        self._lib = lib
        self.seq_len = seq_len
        self.batch_size = batch_size
        self._h = lib.packer_new(seq_len, batch_size)
        if not self._h:
            raise RuntimeError("packer_new failed")

    def feed(self, data) -> None:
        if isinstance(data, str):
            data = data.encode("utf-8", errors="ignore")
        elif isinstance(data, np.ndarray):
            data = np.ascontiguousarray(data.astype(np.uint8)).tobytes()
        if data:
            self._lib.packer_feed(self._h, data, len(data))

    @property
    def ready(self) -> int:
        return int(self._lib.packer_ready(self._h))

    @property
    def buffered_tokens(self) -> int:
        return int(self._lib.packer_buffered(self._h))

    def next_batch(self) -> Optional[np.ndarray]:
        out = np.empty((self.batch_size, self.seq_len + 1), np.int32)
        ok = self._lib.packer_next(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out if ok else None

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.packer_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
