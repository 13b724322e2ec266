"""ctypes bindings for the native host helpers (csrc/svtpu_host.cpp), with
lazy compilation and pure-NumPy fallbacks.

The shared library is built on first use with the system g++ (no Python
headers required) and cached next to the package; `pip install` /
`make hostlib` pre-build it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_failed = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc",
                    "svtpu_host.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_svtpu_host.so")


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _lib_failed = True
            return None
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        ci = ctypes.c_int
        lib.sv_filter_support.argtypes = [i16p, ci, ci, ci, ci, ci, ci, ci]
        lib.sv_filter_support.restype = None
        lib.sv_rasterize.argtypes = [i32p, ci, f32p, f32p, ci, ci, i32p]
        lib.sv_rasterize.restype = None
        _lib = lib
        return _lib


def filter_support_sequential(d_can: np.ndarray, p) -> np.ndarray:
    """Reference-exact sequential support filters (in-place scan-order
    semantics of elas.cpp:152-233).  d_can: (Hc, Wc) int16 -> filtered copy."""
    d = np.ascontiguousarray(d_can, dtype=np.int16).copy()
    hc, wc = d.shape
    lib = get_lib()
    if lib is not None:
        lib.sv_filter_support(d, hc, wc, p.incon_window_size,
                              p.incon_threshold, p.incon_min_support, 5, 1)
        return d
    return _filter_support_np(d, p)


def _filter_support_np(D: np.ndarray, p) -> np.ndarray:
    """Pure-Python fallback with identical sequential semantics (slow; only
    used when no C++ toolchain is available)."""
    hc, wc = D.shape
    w, thr, mins = p.incon_window_size, p.incon_threshold, p.incon_min_support
    for u in range(wc):
        for v in range(hc):
            d = D[v, u]
            if d < 0:
                continue
            win = D[max(0, v - w):v + w + 1, max(0, u - w):u + w + 1]
            supp = int(((win >= 0) & (np.abs(win - d) <= thr)).sum())
            if supp < mins:
                D[v, u] = -1
    for vertical in (True, False):
        dirs = ((-1, 0), (1, 0)) if vertical else ((0, -1), (0, 1))
        for u in range(wc):
            for v in range(hc):
                d = D[v, u]
                if d < 0:
                    continue
                red = True
                for dv, du in dirs:
                    found = False
                    vv, uu = v, u
                    for _ in range(5):
                        vv += dv
                        uu += du
                        if not (0 <= vv < hc and 0 <= uu < wc):
                            break
                        if D[vv, uu] >= 0 and abs(int(d) - int(D[vv, uu])) <= 1:
                            found = True
                            break
                    if not found:
                        red = False
                        break
                if red:
                    D[v, u] = -1
    return D


def rasterize(pts: np.ndarray, tris: np.ndarray, right_image: bool,
              width: int, height: int) -> np.ndarray:
    """Native scanline rasterizer; falls back to the NumPy implementation in
    ops.planes when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        from ..ops.planes import rasterize_tri_ids
        return rasterize_tri_ids(pts, tris, right_image, width, height)
    pu = pts[:, 0].astype(np.float32)
    if right_image:
        pu = pu - pts[:, 2].astype(np.float32)
    pv = pts[:, 1].astype(np.float32)
    tri_id = np.empty((height, width), np.int32)
    tris32 = np.ascontiguousarray(tris, dtype=np.int32)
    if len(tris32) == 0:
        tri_id.fill(-1)
        return tri_id
    lib.sv_rasterize(tris32, len(tris32), np.ascontiguousarray(pu),
                     np.ascontiguousarray(pv), width, height, tri_id)
    return tri_id
