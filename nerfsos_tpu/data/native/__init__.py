"""ctypes bindings for the native threaded gather kernels (gather.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every entry point has a numpy fallback so the package works without a
toolchain. pybind11 is not in this image — plain C ABI + ctypes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "gather.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgather.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

N_THREADS = min(8, os.cpu_count() or 1)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            try:
                subprocess.check_call(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", _LIB_PATH],
                    stderr=subprocess.DEVNULL,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.gather_patches.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = src[idx[i]] over the leading axis (threaded memcpy)."""
    src = np.ascontiguousarray(src) if not src.flags["C_CONTIGUOUS"] else src
    lib = _load()
    if lib is None:
        return src[idx]
    idx = np.ascontiguousarray(idx, np.int64)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    out = np.empty((idx.shape[0],) + src.shape[1:], src.dtype)
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.c_void_p), idx.shape[0], row_bytes, N_THREADS,
    )
    return out


def gather_patches(src: np.ndarray, img_idx: np.ndarray, h_idx: np.ndarray,
                   w_idx: np.ndarray, patch: int, stride: int) -> np.ndarray:
    """Strided P x P crops: src [N, H, W, ...] -> [B, P, P, ...]."""
    lib = _load()
    B = img_idx.shape[0]
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        out = np.empty((B, patch, patch) + src.shape[3:], src.dtype)
        for b in range(B):
            i, h, w = img_idx[b], h_idx[b], w_idx[b]
            cs = patch * stride
            out[b] = src[i, h:h + cs:stride, w:w + cs:stride]
        return out
    N, H, W = src.shape[:3]
    px_bytes = src.dtype.itemsize * int(np.prod(src.shape[3:], dtype=np.int64)) \
        if src.ndim > 3 else src.dtype.itemsize
    out = np.empty((B, patch, patch) + src.shape[3:], src.dtype)
    lib.gather_patches(
        src.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(img_idx, np.int64).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(h_idx, np.int64).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(w_idx, np.int64).ctypes.data_as(ctypes.c_void_p),
        B, H, W, patch, stride, px_bytes, N_THREADS,
    )
    return out
