"""Lazy g++ build + ctypes loader for the native host components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libsavsr_native.so; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "resample.cpp")
        out = os.path.join(_HERE, "libsavsr_native.so")
        try:
            if (not os.path.isfile(out)) or os.path.getmtime(out) < os.path.getmtime(src):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-pthread", src, "-o", out,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(out)
            lib.resample_hw_f32.restype = None
            lib.resample_hw_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # x
                ctypes.POINTER(ctypes.c_float),  # scratch
                ctypes.POINTER(ctypes.c_float),  # out
                ctypes.POINTER(ctypes.c_float),  # mh
                ctypes.POINTER(ctypes.c_float),  # mw
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def resample_native(x, mh, mw, n_threads: int = 0):
    """Native two-pass resample of [N, H, W, C] float32 (or None if the
    native library is unavailable)."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    mh = np.ascontiguousarray(mh, dtype=np.float32)
    mw = np.ascontiguousarray(mw, dtype=np.float32)
    n, h_in, w_in, c = x.shape
    h_out, w_out = mh.shape[0], mw.shape[0]
    scratch = np.empty((n, h_out, w_in, c), dtype=np.float32)
    out = np.empty((n, h_out, w_out, c), dtype=np.float32)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.resample_hw_f32(
        x.ctypes.data_as(fp), scratch.ctypes.data_as(fp), out.ctypes.data_as(fp),
        mh.ctypes.data_as(fp), mw.ctypes.data_as(fp),
        n, h_in, w_in, c, h_out, w_out, n_threads,
    )
    return out
