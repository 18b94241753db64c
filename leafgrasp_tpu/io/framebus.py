"""Frame-pairing ingest bus: ctypes binding to the native C++ runtime.

Replaces the reference's callback-attribute + processing-flag +
parameter-server-busy-wait plumbing (leaf_grasp_node_v3.py:104-218) with
a lock-free triple-buffered mailbox per stream (native/framebus.cpp).
Producers (segmentation / stereo processes) never block; the consumer
atomically takes the freshest unseen (mask, depth) pair.

Falls back to a mutex-based pure-python implementation when no compiler
is available, keeping the identical API.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["FrameBus", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframebus.so")
_lib = None
_lib_err: Optional[str] = None


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    src = os.path.join(_NATIVE_DIR, "framebus.cpp")
    try:  # a framebus.cpp newer than the .so must not be served stale
        return os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


def _load_native():
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        if _needs_rebuild():
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fb_create.restype = ctypes.c_void_p
        lib.fb_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.fb_destroy.argtypes = [ctypes.c_void_p]
        lib.fb_push_mask.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64]
        lib.fb_push_depth.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64]
        lib.fb_try_get_pair.restype = ctypes.c_int
        lib.fb_try_get_pair.argtypes = [ctypes.c_void_p] + \
            [ctypes.c_void_p] * 4
        lib.fb_stats.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
        _lib = lib
    except Exception as e:  # pragma: no cover - env without toolchain
        _lib_err = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


class _PyBus:
    """Mutex fallback with identical semantics."""

    def __init__(self, height, width):
        self._lock = threading.Lock()
        self._mask = None
        self._depth = None
        self._mask_stamp = 0
        self._depth_stamp = 0
        self.stats = dict(mask_pushed=0, mask_dropped=0, depth_pushed=0,
                          depth_dropped=0, pairs=0)

    def push_mask(self, arr, stamp):
        with self._lock:
            if self._mask is not None:
                self.stats["mask_dropped"] += 1
            self._mask = arr.copy()
            self._mask_stamp = stamp
            self.stats["mask_pushed"] += 1

    def push_depth(self, arr, stamp):
        with self._lock:
            if self._depth is not None:
                self.stats["depth_dropped"] += 1
            self._depth = arr.copy()
            self._depth_stamp = stamp
            self.stats["depth_pushed"] += 1

    def try_get_pair(self):
        with self._lock:
            if self._mask is None or self._depth is None:
                return None
            out = (self._mask, self._depth, self._mask_stamp,
                   self._depth_stamp)
            self._mask = self._depth = None
            self.stats["pairs"] += 1
            return out


class FrameBus:
    """Latest-frame pairing bus. Thread-safe: one consumer, one producer
    per stream."""

    def __init__(self, height: int, width: int, prefer_native: bool = True):
        self.height = height
        self.width = width
        self._native = _load_native() if prefer_native else None
        if self._native is not None:
            self._handle = self._native.fb_create(height, width)
            self._mask_buf = np.empty((height, width), np.int16)
            self._depth_buf = np.empty((height, width), np.float32)
        else:
            self._py = _PyBus(height, width)

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def push_mask(self, mask: np.ndarray, stamp_us: int = 0):
        mask = np.ascontiguousarray(mask, np.int16)
        assert mask.shape == (self.height, self.width)
        if self._native is not None:
            self._native.fb_push_mask(
                self._handle, mask.ctypes.data_as(ctypes.c_void_p),
                int(stamp_us))
        else:
            self._py.push_mask(mask, stamp_us)

    def push_depth(self, depth: np.ndarray, stamp_us: int = 0):
        depth = np.ascontiguousarray(depth, np.float32)
        assert depth.shape == (self.height, self.width)
        if self._native is not None:
            self._native.fb_push_depth(
                self._handle, depth.ctypes.data_as(ctypes.c_void_p),
                int(stamp_us))
        else:
            self._py.push_depth(depth, stamp_us)

    def try_get_pair(self) -> Optional[Tuple[np.ndarray, np.ndarray,
                                             int, int]]:
        """Freshest unseen (mask, depth, mask_stamp, depth_stamp), or
        None when either stream has no new frame."""
        if self._native is not None:
            ms = ctypes.c_int64()
            ds = ctypes.c_int64()
            got = self._native.fb_try_get_pair(
                self._handle,
                self._mask_buf.ctypes.data_as(ctypes.c_void_p),
                self._depth_buf.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(ms), ctypes.byref(ds))
            if not got:
                return None
            return (self._mask_buf.copy(), self._depth_buf.copy(),
                    ms.value, ds.value)
        return self._py.try_get_pair()

    def stats(self) -> dict:
        if self._native is not None:
            vals = [ctypes.c_uint64() for _ in range(5)]
            self._native.fb_stats(self._handle,
                                  *[ctypes.byref(v) for v in vals])
            keys = ("mask_pushed", "mask_dropped", "depth_pushed",
                    "depth_dropped", "pairs")
            return dict(zip(keys, (v.value for v in vals)))
        return dict(self._py.stats)

    def close(self):
        if self._native is not None and self._handle:
            self._native.fb_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
