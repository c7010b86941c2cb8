"""ctypes binding for the native host data backend (csrc/uresnet_native.cpp).

Builds the shared library on first use with g++ (this image has no pybind11;
plain C ABI + ctypes keeps the dependency surface zero). Every entry point
has a NumPy fallback with identical semantics — `available()` gates use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "uresnet_native.cpp")
_LIB_DIR = os.path.join(os.path.dirname(_SRC), "_build")
_LIB = os.path.join(_LIB_DIR, "liburesnet_native.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.upt_encode_keys.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                        ctypes.c_int32, i32p, i64p]
        lib.upt_collate.restype = ctypes.c_int32
        lib.upt_collate.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            i32p, f32p, f32p, f32p, i64p,
            i32p, f32p, i32p, f32p, i32p]
        lib.upt_dedup.restype = ctypes.c_int64
        lib.upt_dedup.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32,
                                  i32p, f32p, i32p, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def collate(coords: np.ndarray, values: np.ndarray, labels, weights,
            splits: np.ndarray, batch: int, capacity: int, dim: int):
    """CSR event arrays -> padded blob arrays. Returns (blob dict pieces,
    truncated count)."""
    lib = _load()
    out_coords = np.empty((batch, capacity, dim), np.int32)
    out_values = np.empty((batch, capacity), np.float32)
    out_label = np.empty((batch, capacity), np.int32)
    out_weight = np.empty((batch, capacity), np.float32)
    out_n = np.empty((batch,), np.int32)
    coords = np.ascontiguousarray(coords, np.int32)
    values = np.ascontiguousarray(values, np.float32)
    splits = np.ascontiguousarray(splits, np.int64)
    lab = (np.ascontiguousarray(labels, np.float32)
           if labels is not None else None)
    wgt = (np.ascontiguousarray(weights, np.float32)
           if weights is not None else None)
    null_f = ctypes.POINTER(ctypes.c_float)()
    truncated = lib.upt_collate(
        batch, capacity, dim,
        _ptr(coords, ctypes.c_int32), _ptr(values, ctypes.c_float),
        _ptr(lab, ctypes.c_float) if lab is not None else null_f,
        _ptr(wgt, ctypes.c_float) if wgt is not None else null_f,
        _ptr(splits, ctypes.c_int64),
        _ptr(out_coords, ctypes.c_int32), _ptr(out_values, ctypes.c_float),
        _ptr(out_label, ctypes.c_int32), _ptr(out_weight, ctypes.c_float),
        _ptr(out_n, ctypes.c_int32))
    return (out_coords, out_values,
            out_label if lab is not None else None,
            out_weight if wgt is not None else None,
            out_n, int(truncated))


def dedup(coords: np.ndarray, values: np.ndarray, spatial_size: int,
          merge_mode: str = "sum"):
    """Host-side sort+dedupe of voxel sets (file converters / raw loaders)."""
    lib = _load()
    mode = {"sum": 0, "mean": 1, "max": 2, "last": 3}[merge_mode]
    n, dim = coords.shape
    bits = max(1, int(np.ceil(np.log2(spatial_size))))
    coords = np.ascontiguousarray(coords, np.int32)
    values = np.ascontiguousarray(values, np.float32)
    out_c = np.empty_like(coords)
    out_v = np.empty_like(values)
    m = lib.upt_dedup(n, dim, bits, mode,
                      _ptr(coords, ctypes.c_int32),
                      _ptr(values, ctypes.c_float),
                      _ptr(out_c, ctypes.c_int32),
                      _ptr(out_v, ctypes.c_float))
    return out_c[:m], out_v[:m]


def encode_keys(coords: np.ndarray, spatial_size: int) -> np.ndarray:
    lib = _load()
    n, dim = coords.shape
    bits = max(1, int(np.ceil(np.log2(spatial_size))))
    coords = np.ascontiguousarray(coords, np.int32)
    out = np.empty((n,), np.int64)
    lib.upt_encode_keys(n, dim, bits, _ptr(coords, ctypes.c_int32),
                        _ptr(out, ctypes.c_int64))
    return out
