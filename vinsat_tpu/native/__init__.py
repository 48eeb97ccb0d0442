"""ctypes bindings for the native host runtime (graph builder, window
splitter, raster cropper).

The shared library is built lazily on first import if g++ is available;
callers fall back to the numpy implementations in estimation/ingest.py when
it is not.  `available()` reports the state.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_builder.cpp")
_SO = os.path.join(_DIR, "libvinsat_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.vt_build_graph.restype = i64
    lib.vt_build_graph.argtypes = [p_i64, i64, i64, i64, p_i64, p_i64, i64]
    lib.vt_split_windows.restype = i64
    lib.vt_split_windows.argtypes = [p_i64, i64, p_i64, i64, i64, i64, i64,
                                     p_i64, i64]
    lib.vt_crop_window.restype = None
    lib.vt_crop_window.argtypes = [p_u8, i64, i64, i64, i64, i64, i64, i64,
                                   p_u8]
    lib.vt_compact_graph.restype = i64
    lib.vt_compact_graph.argtypes = [p_i64, p_u8, i64, p_i64, i64, i64,
                                     p_u8, p_i64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_graph(frames: np.ndarray, stride: int, orbit_len: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """(ii, knot_times) for sorted detection frames; see ingest.build_graph."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, dtype=np.int64)
    m = len(frames)
    cap = m + orbit_len // stride + 2
    ii = np.zeros(m, np.int64)
    knots = np.zeros(cap, np.int64)
    n = lib.vt_build_graph(frames, m, stride, orbit_len, ii, knots, cap)
    assert n >= 0, "knot capacity exceeded"
    return ii, knots[:n]


def split_windows(ii: np.ndarray, knot_t: np.ndarray,
                  contiguous_gap: int = 100, split_gap: int = 200,
                  min_contiguous: int = 4) -> List[Tuple[int, int, bool]]:
    lib = _load()
    assert lib is not None
    ii = np.ascontiguousarray(ii, dtype=np.int64)
    knot_t = np.ascontiguousarray(knot_t, dtype=np.int64)
    max_w = len(ii) + 1
    wins = np.zeros(3 * max_w, np.int64)
    n = lib.vt_split_windows(ii, len(ii), knot_t, len(knot_t),
                             contiguous_gap, split_gap, min_contiguous,
                             wins, max_w)
    assert n >= 0
    return [(int(wins[3 * k]), int(wins[3 * k + 1]), bool(wins[3 * k + 2]))
            for k in range(n)]


def crop_window(data: np.ndarray, y0: int, x0: int, oh: int, ow: int
                ) -> np.ndarray:
    """Zero-padded crop data[y0:y0+oh, x0:x0+ow] (SatCam.get_windowed_image
    equivalent), uint8 HWC."""
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    h, w, c = data.shape
    out = np.zeros((oh, ow, c), np.uint8)
    lib.vt_crop_window(data, h, w, c, y0, x0, oh, ow, out)
    return out


def compact_graph(ii: np.ndarray, mask: np.ndarray, knot_t: np.ndarray,
                  stride: int = 1000) -> Tuple[np.ndarray, np.ndarray]:
    """(keep_knot bool array, re-indexed ii of kept obs)."""
    lib = _load()
    assert lib is not None
    ii = np.ascontiguousarray(ii, dtype=np.int64)
    mask8 = np.ascontiguousarray(mask, dtype=np.uint8)
    knot_t = np.ascontiguousarray(knot_t, dtype=np.int64)
    keep = np.zeros(len(knot_t), np.uint8)
    ii_new = np.zeros(int(mask8.sum()), np.int64)
    lib.vt_compact_graph(ii, mask8, len(ii), knot_t, len(knot_t), stride,
                         keep, ii_new)
    return keep.astype(bool), ii_new
