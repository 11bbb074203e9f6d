"""ctypes bindings for the native runtime library (native/plasticnet_native.cc).

Build-on-demand: the first import attempts `make` in native/ if the shared
library is missing. Every caller has a pure-Python fallback, so the framework
works (slower) without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libplasticnet_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _threads() -> int:
    return max(os.cpu_count() or 1, 1)


def get_lib():
    """Load (building if needed) the native library; raises on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise OSError("native library build previously failed")
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=120,
                )
            except Exception as e:
                _build_failed = True
                raise OSError(f"could not build native library: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)

        lib.rle_encode_batch.restype = ctypes.c_longlong
        lib.rle_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
        ]
        lib.load_png_gray_batch.restype = ctypes.c_int
        lib.load_png_gray_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.iou_threshold_sweep.restype = None
        lib.iou_threshold_sweep.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def rle_encode_batch_native(masks: np.ndarray, chunk: int = 512) -> list[str]:
    """Batch column-major RLE via C++. masks: (N, H, W) binarizable array."""
    lib = get_lib()
    masks = np.ascontiguousarray((np.asarray(masks) != 0).astype(np.uint8))
    n, h, w = masks.shape
    out: list[str] = []
    # worst case per mask: alternating pixels -> h*w/2 pairs * ~14 chars
    cap_per = 8 * h * w + 16
    for i in range(0, n, chunk):
        batch = masks[i : i + chunk]
        buf = ctypes.create_string_buffer(cap_per * len(batch))
        written = lib.rle_encode_batch(
            batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(batch), h, w, buf, len(buf), _threads(),
        )
        if written < 0:
            raise OverflowError("RLE output buffer overflow")
        raw = buf.raw[:written]
        out.extend(s.decode() for s in raw.split(b"\0")[:-1])
    return out


def load_png_gray_batch_native(paths: list[str], h: int, w: int) -> np.ndarray:
    """Threaded PNG grayscale batch load via C++. Returns (N, h, w) float64."""
    lib = get_lib()
    out = np.empty((len(paths), h, w), dtype=np.float64)
    joined = b"\0".join(p.encode() for p in paths) + b"\0"
    failures = lib.load_png_gray_batch(
        joined, len(paths), h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _threads()
    )
    if failures:
        raise IOError(f"{failures} PNG file(s) failed to load")
    return out


def iou_threshold_sweep_native(y_true: np.ndarray, preds: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """CPU-native threshold sweep (same semantics as ops.iou.threshold_sweep_jit)."""
    lib = get_lib()
    n = y_true.shape[0]
    t = np.ascontiguousarray(np.asarray(y_true, np.float32).reshape(n, -1))
    p = np.ascontiguousarray(np.asarray(preds, np.float32).reshape(n, -1))
    thr = np.ascontiguousarray(np.asarray(thresholds, np.float32))
    out = np.empty(len(thr), dtype=np.float32)
    lib.iou_threshold_sweep(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, t.shape[1],
        thr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(thr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads(),
    )
    return out
