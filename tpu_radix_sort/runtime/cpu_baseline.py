"""Native CPU baseline sorter (ctypes binding to runtime/native/sort.cc).

The reference's benchmark compares GPU vs the host's `Array.prototype.sort`
(`example/index.ts:147-151`); this module provides the equivalent host-side
baseline as real native code: a stable LSD radix sort in C++, built on first
use with g++ and loaded via ctypes. Falls back to NumPy's stable sort if no
compiler is available (e.g. stripped containers).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "sort.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    """Compile sort.cc into a cached shared library and dlopen it."""
    cache_dir = os.environ.get(
        "TRS_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "trs_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libtrs_sort.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
        tmp = so_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.trs_radix_sort_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
    ]
    lib.trs_radix_sort_u32.restype = None
    lib.trs_disorder_count_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
    ]
    lib.trs_disorder_count_u32.restype = ctypes.c_size_t
    return lib


def _get_lib():
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def cpu_sort(keys: np.ndarray, values: np.ndarray | None = None):
    """Stable ascending sort of uint32 keys (+optional uint32 values) on CPU.

    Uses the native radix sort when available, NumPy stable sort otherwise.
    Returns new arrays; inputs are untouched.
    """
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    lib = _get_lib()
    if lib is None:
        order = np.argsort(keys, kind="stable")
        return (keys[order], values[order]) if values is not None else keys[order]
    k = keys.copy()
    kp = k.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    if values is not None:
        v = np.ascontiguousarray(values, dtype=np.uint32).copy()
        vp = v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        lib.trs_radix_sort_u32(kp, vp, k.size)
        return k, v
    lib.trs_radix_sort_u32(kp, None, k.size)
    return k


def cpu_disorder_count(keys: np.ndarray) -> int:
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    lib = _get_lib()
    if lib is None:
        return int(np.sum(keys[:-1] > keys[1:])) if keys.size > 1 else 0
    kp = keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    return int(lib.trs_disorder_count_u32(kp, keys.size))
