"""Native (C++) eval kernels with lazy build + ctypes bindings.

Build: g++ -O3 -shared -fPIC edge_ops.cpp, cached next to the source.  The
Python implementations (data.pascal_context.zhang_suen_thin,
evaluation.edge_eval._match_counts) are the behavioral reference and the
fallback when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "edge_ops.cpp")
_LIB = os.path.join(_HERE, "edge_ops_lib.bin")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if (not os.path.isfile(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.zhang_suen_thin.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.match_boundaries.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return _load() is not None


def thin(img: np.ndarray, max_iter: int = 10000) -> Optional[np.ndarray]:
    """Native Zhang-Suen thinning; None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray((img > 0).astype(np.uint8))
    h, w = buf.shape
    lib.zhang_suen_thin(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, max_iter
    )
    return buf


def match_boundaries(
    pred: np.ndarray, gt: np.ndarray, max_dist: float
) -> Optional[Tuple[int, int, int, int]]:
    """Native greedy correspondence; returns (matched_pred, n_pred,
    matched_gt, n_gt) like edge_eval._match_counts, or None w/o toolchain."""
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray((pred > 0).astype(np.uint8))
    g = np.ascontiguousarray((gt > 0).astype(np.uint8))
    h, w = p.shape
    matched = ctypes.c_int(0)
    n_pred = ctypes.c_int(0)
    n_gt = ctypes.c_int(0)
    lib.match_boundaries(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, float(max_dist),
        ctypes.byref(matched), ctypes.byref(n_pred), ctypes.byref(n_gt),
    )
    return matched.value, n_pred.value, matched.value, n_gt.value
