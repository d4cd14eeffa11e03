"""Native (C++) host-side data kernels, loaded via ctypes.

Builds ``lfm_data.cc`` on first use (g++ -O3 -fopenmp, cached next to the
source); every entry point has a numpy fallback so the framework runs
without a compiler. See lfm_data.cc for what each kernel replaces.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "lfm_data.cc")
_SO = os.path.join(os.path.dirname(__file__), "_lfm_data.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-o", _SO, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        return ctypes.CDLL(_SO)
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"[lfm_tpu.native] build failed ({e}); using numpy fallback",
              file=sys.stderr)
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                lib = _build()
                if lib is not None:
                    u8p = ctypes.POINTER(ctypes.c_uint8)
                    f32p = ctypes.POINTER(ctypes.c_float)
                    i32p = ctypes.POINTER(ctypes.c_int32)
                    i64 = ctypes.c_int64
                    lib.lfm_normalize_batch.argtypes = [u8p, f32p, i64, i64, i64, i64, u8p]
                    lib.lfm_crop_normalize_batch.argtypes = [
                        u8p, f32p, i64, i64, i64, i64, i64, i32p, i32p, u8p,
                    ]
                    lib.lfm_one_hot.argtypes = [i32p, f32p, i64, i64, i64]
                _lib = lib
    return _lib


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def normalize_batch(src: np.ndarray, flip: Optional[np.ndarray] = None) -> np.ndarray:
    """(n,h,w,c) uint8 -> float32 in [-1,1], optional per-item hflip."""
    src = np.ascontiguousarray(src, np.uint8)
    lib = get_lib()
    if lib is None:
        out = src.astype(np.float32) / 127.5 - 1.0
        if flip is not None:
            out[flip.astype(bool)] = out[flip.astype(bool)][:, :, ::-1]
        return out
    n, h, w, c = src.shape
    dst = np.empty(src.shape, np.float32)
    fl = np.ascontiguousarray(flip, np.uint8) if flip is not None else np.zeros(n, np.uint8)
    lib.lfm_normalize_batch(_u8(src), _f32(dst), n, h, w, c, _u8(fl))
    return dst


def crop_normalize_batch(src: np.ndarray, size: int, tops: np.ndarray,
                         lefts: np.ndarray, flip: Optional[np.ndarray] = None) -> np.ndarray:
    src = np.ascontiguousarray(src, np.uint8)
    n, h, w, c = src.shape
    lib = get_lib()
    if lib is None:
        out = np.empty((n, size, size, c), np.float32)
        for i in range(n):
            crop = src[i, tops[i]:tops[i] + size, lefts[i]:lefts[i] + size]
            if flip is not None and flip[i]:
                crop = crop[:, ::-1]
            out[i] = crop.astype(np.float32) / 127.5 - 1.0
        return out
    dst = np.empty((n, size, size, c), np.float32)
    tops = np.ascontiguousarray(tops, np.int32)
    lefts = np.ascontiguousarray(lefts, np.int32)
    fl = np.ascontiguousarray(flip, np.uint8) if flip is not None else np.zeros(n, np.uint8)
    lib.lfm_crop_normalize_batch(_u8(src), _f32(dst), n, h, w, c, size,
                                 _i32(tops), _i32(lefts), _u8(fl))
    return dst


def one_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(n,h,w) int32 -> (n,h,w,k) float32."""
    labels = np.ascontiguousarray(labels, np.int32)
    lib = get_lib()
    if lib is None:
        return (labels[..., None] == np.arange(num_classes, dtype=np.int32)).astype(np.float32)
    n, h, w = labels.shape
    dst = np.empty((n, h, w, num_classes), np.float32)
    lib.lfm_one_hot(_i32(labels), _f32(dst), n, h * w, num_classes)
    return dst
