"""Native (C++) runtime components with build-on-first-use + fallbacks.

Loads the scan_io shared library (compiled from scan_io.cpp with g++ on
first import, cached next to the source).  Every entry point has a pure
numpy fallback so the framework degrades gracefully where no toolchain
exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "scan_io.cpp")
_LIB = os.path.join(_DIR, "libscan_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain absent or failed: fall back
        print(f"[native] build failed, numpy fallback in use: {e}", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"[native] load failed: {e}", file=sys.stderr)
            return None
        lib.decode_f32_file.restype = ctypes.c_long
        lib.decode_f32_file.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_long]
        lib.file_size_bytes.restype = ctypes.c_long
        lib.file_size_bytes.argtypes = [ctypes.c_char_p]
        lib.pcd_read_binary.restype = ctypes.c_long
        lib.pcd_read_binary.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                        ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_long, ctypes.c_long]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_size.restype = ctypes.c_long
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_long, ctypes.c_double]
        lib.ring_pop.restype = ctypes.c_long
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_long, ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def decode_f32_file(path: str, max_floats: Optional[int] = None) -> np.ndarray:
    """Fast float32 record file decode (KITTI .bin etc)."""
    lib = get_lib()
    if lib is None:
        return np.fromfile(path, dtype=np.float32,
                           count=-1 if max_floats is None else max_floats)
    size = lib.file_size_bytes(path.encode())
    if size < 0:
        raise FileNotFoundError(path)
    n = size // 4
    if max_floats is not None:
        n = min(n, max_floats)
    out = np.empty(n, dtype=np.float32)
    got = lib.decode_f32_file(path.encode(),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        raise IOError(f"native decode failed for {path}")
    return out[:got]


def pcd_read_binary_payload(path: str, data_offset: int, n_floats: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            f.seek(data_offset)
            return np.frombuffer(f.read(n_floats * 4), dtype="<f4").copy()
    out = np.empty(n_floats, dtype=np.float32)
    got = lib.pcd_read_binary(path.encode(), data_offset,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              n_floats)
    if got < 0:
        raise IOError(f"native pcd read failed for {path}")
    return out[:got]


class NativeRingBuffer:
    """SPSC lock-free scan buffer (≙ CircularBuffer.hpp); falls back to a
    Python deque when the native library is unavailable."""

    def __init__(self, n_slots: int = 4, slot_floats: int = 4 * 131072):
        self._lib = get_lib()
        self.slot_floats = slot_floats
        if self._lib is not None:
            self._h = self._lib.ring_create(n_slots, slot_floats)
            self._fallback = None
        else:
            from collections import deque

            self._h = None
            self._fallback = deque(maxlen=n_slots)
            self._n_slots = n_slots

    def push(self, payload: np.ndarray, stamp: float) -> bool:
        payload = np.ascontiguousarray(payload, dtype=np.float32).reshape(-1)
        if self._lib is not None:
            ok = self._lib.ring_push(
                self._h, payload.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                payload.size, float(stamp))
            return bool(ok)
        if len(self._fallback) >= self._n_slots:
            return False
        self._fallback.append((payload.copy(), float(stamp)))
        return True

    def pop(self):
        if self._lib is not None:
            out = np.empty(self.slot_floats, dtype=np.float32)
            stamp = ctypes.c_double()
            n = self._lib.ring_pop(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.slot_floats, ctypes.byref(stamp))
            if n == 0:
                return None
            return out[:n], stamp.value
        if not self._fallback:
            return None
        return self._fallback.popleft()

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_size(self._h))
        return len(self._fallback)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            try:
                self._lib.ring_destroy(self._h)
            except Exception:
                pass
