"""Native (C++) host-path cores, built on demand and loaded via ctypes.

The compute path is JAX/XLA/Pallas; these cover the irregular host-graph
work the reference delegates to C++ (COLMAP's track building). Falls back
to the pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(__file__)
_LIB_PATH = osp.join(_HERE, "_libonepose_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


_SOURCES = ["union_find.cpp", "frame_loader.cpp"]


def _build() -> bool:
    srcs = [osp.join(_HERE, s) for s in _SOURCES]
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]
    attempts = [
        base + srcs + ["-lpng", "-ljpeg", "-lz", "-o", _LIB_PATH],
        # Image libraries unavailable: graph cores only (frame loader
        # callers fall back to the Python/cv2 path).
        base + [srcs[0], "-o", _LIB_PATH],
    ]
    for cmd in attempts:
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            return True
        except Exception:
            continue
    return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        newest_src = max(
            osp.getmtime(osp.join(_HERE, s))
            for s in _SOURCES
            if osp.exists(osp.join(_HERE, s))
        )
        if not osp.exists(_LIB_PATH) or osp.getmtime(_LIB_PATH) < newest_src:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.uf_connected_components.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.uf_merge_close.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        if hasattr(lib, "fl_create"):
            lib.fl_create.restype = ctypes.c_void_p
            lib.fl_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_void_p,  # affines (float* or NULL)
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.fl_next.restype = ctypes.c_int
            lib.fl_next.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            lib.fl_destroy.argtypes = [ctypes.c_void_p]
            lib.fl_probe.restype = ctypes.c_int
            lib.fl_probe.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            lib.fl_read_gray.restype = ctypes.c_int
            lib.fl_read_gray.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
            ]
        _lib = lib
        return _lib


def connected_components(n: int, ea: np.ndarray, eb: np.ndarray):
    """Root labels [n] for the edge graph; None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    parent = np.empty(n, np.int64)
    lib.uf_connected_components(
        n,
        np.ascontiguousarray(ea, np.int64),
        np.ascontiguousarray(eb, np.int64),
        len(ea),
        parent,
    )
    return parent


def merge_close(
    xyz: np.ndarray, cand_a: np.ndarray, cand_b: np.ndarray, thr: float
):
    """Union-find labels for candidate pairs within thr; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(xyz)
    parent = np.empty(n, np.int64)
    lib.uf_merge_close(
        n,
        np.ascontiguousarray(xyz, np.float64),
        np.ascontiguousarray(cand_a, np.int64),
        np.ascontiguousarray(cand_b, np.int64),
        len(cand_a),
        thr * thr,
        parent,
    )
    return parent
