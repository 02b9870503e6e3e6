"""ctypes bindings for the native task-packing engine (native/taskpack.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    """Load libtaskpack.so, building it with g++ on first use if needed."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(_SRC_DIR, "libtaskpack.so")
        src_path = os.path.join(_SRC_DIR, "taskpack.cpp")
        if not os.path.exists(so_path) and os.path.exists(src_path):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     src_path, "-o", so_path],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(so_path):
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.pack_station_batches.restype = ctypes.c_int
        lib.pack_station_batches.argtypes = [
            ctypes.POINTER(ctypes.c_int64),   # times
            ctypes.POINTER(ctypes.c_float),   # x1
            ctypes.POINTER(ctypes.c_float),   # x2
            ctypes.POINTER(ctypes.c_float),   # values
            ctypes.c_int64, ctypes.c_int64,   # n_rows, n_cols
            ctypes.POINTER(ctypes.c_int64),   # dates
            ctypes.c_int64,                   # n_dates
            ctypes.c_int64, ctypes.c_int,     # capacity, mode
            ctypes.c_double, ctypes.c_int64,  # frac, count
            ctypes.c_uint64,                  # seed
            ctypes.POINTER(ctypes.c_float),   # out_x
            ctypes.POINTER(ctypes.c_float),   # out_y
            ctypes.POINTER(ctypes.c_float),   # out_mask
            ctypes.POINTER(ctypes.c_int64),   # out_counts
        ]
        lib.interp_grid_points.restype = None
        lib.interp_grid_points.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def pack_station_batches(
    times: np.ndarray,   # (R,) datetime64 or int64 epoch-seconds
    x1: np.ndarray,      # (R,) f32
    x2: np.ndarray,      # (R,) f32
    values: np.ndarray,  # (R, C) f32
    dates: np.ndarray,   # (B,) datetime64 or int64
    capacity: int,
    mode: str = "all",
    frac: float = 1.0,
    count: int = 0,
    seed: int = 0,
):
    """Pack per-date padded batches natively.

    Returns (x (B,cap,2), y (B,cap,C), mask (B,cap), counts (B,)) or None
    when the native library is unavailable (caller falls back to Python).
    """
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(np.asarray(times).astype("datetime64[s]").astype(np.int64))
    d = np.ascontiguousarray(np.asarray(dates).astype("datetime64[s]").astype(np.int64))
    x1 = np.ascontiguousarray(x1, np.float32)
    x2 = np.ascontiguousarray(x2, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    R, C = values.shape
    B = len(d)
    out_x = np.empty((B, capacity, 2), np.float32)
    out_y = np.empty((B, capacity, C), np.float32)
    out_mask = np.empty((B, capacity), np.float32)
    out_counts = np.empty((B,), np.int64)
    mode_i = {"all": 0, "fraction": 1, "count": 2}[mode]
    rc = lib.pack_station_batches(
        _ptr(t, ctypes.c_int64), _ptr(x1, ctypes.c_float), _ptr(x2, ctypes.c_float),
        _ptr(values, ctypes.c_float), R, C,
        _ptr(d, ctypes.c_int64), B,
        capacity, mode_i, float(frac), int(count), int(seed) & (2**64 - 1),
        _ptr(out_x, ctypes.c_float), _ptr(out_y, ctypes.c_float),
        _ptr(out_mask, ctypes.c_float), _ptr(out_counts, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError(
            f"station rows exceed capacity {capacity} for at least one date"
        )
    return out_x, out_y, out_mask, out_counts


def interp_grid_points_native(grid: np.ndarray, g1: np.ndarray, g2: np.ndarray,
                              px1: np.ndarray, px2: np.ndarray):
    """Bilinear gather; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.float32)
    g1 = np.ascontiguousarray(g1, np.float64)
    g2 = np.ascontiguousarray(g2, np.float64)
    px1 = np.ascontiguousarray(px1, np.float64)
    px2 = np.ascontiguousarray(px2, np.float64)
    out = np.empty(len(px1), np.float32)
    lib.interp_grid_points(
        _ptr(grid, ctypes.c_float), grid.shape[0], grid.shape[1],
        _ptr(g1, ctypes.c_double), _ptr(g2, ctypes.c_double),
        _ptr(px1, ctypes.c_double), _ptr(px2, ctypes.c_double),
        len(px1), _ptr(out, ctypes.c_float),
    )
    return out
