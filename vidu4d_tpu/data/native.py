"""ctypes bindings for the native batch sampler (csrc/batch_sampler.cpp).

Compiled on demand with g++ (cached next to the source); callers fall back
to numpy gathers when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _csrc_dir():
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")


def load_library():
    """Compile (once) and load the shared library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_csrc_dir(), "batch_sampler.cpp")
        so = os.path.join(_csrc_dir(), "libbatch_sampler.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            for name in ("gather_pixels_f16", "gather_pixels_f32"):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_int,
                ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def gather_pixels(src: np.ndarray, frame_ids: np.ndarray, xy: np.ndarray,
                  n_threads: int = 8) -> np.ndarray:
    """Gather pixels: src (T, H, W, C) f16/f32; frame_ids (n,); xy (n, p, 2)
    int32 (x, y). Returns (n, p, C) float32. Numpy fallback when the native
    library is unavailable."""
    if src.ndim == 3:
        src = src[..., None]
    t, h, w, c = src.shape
    n, p, _ = xy.shape
    if n * p * c < (1 << 17):
        n_threads = 1  # thread spawn would dominate on small gathers
    lib = load_library()
    if lib is not None and src.flags.c_contiguous and src.dtype in (
        np.float16, np.float32
    ):
        out = np.empty((n, p, c), np.float32)
        frame_ids = np.ascontiguousarray(frame_ids, np.int32)
        xy = np.ascontiguousarray(xy, np.int32)
        fn = (lib.gather_pixels_f16 if src.dtype == np.float16
              else lib.gather_pixels_f32)
        fn(src.ctypes.data, t, h, w, c, frame_ids.ctypes.data, xy.ctypes.data,
           n, p, out.ctypes.data, n_threads)
        return out
    # numpy fallback
    out = src[frame_ids[:, None], xy[..., 1], xy[..., 0]]
    return np.asarray(out, np.float32)
