"""ctypes bindings for the native KD-split merge subsampler.

Loads native/libmdi_native.so, building it with the repo Makefile on first
use if necessary (the reference ships its module as a Conan/CMake pybind11
wheel; this environment has no pybind11, so the C ABI + ctypes is the
boundary instead — see native/subsampling.cpp).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmdi_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mdi_subsample_pointcloud.restype = ctypes.c_int64
    lib.mdi_subsample_pointcloud.argtypes = [
        f32p, f32p, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, f32p, f32p,
    ]
    lib.mdi_subsample_pointcloud_ex.restype = ctypes.c_int64
    lib.mdi_subsample_pointcloud_ex.argtypes = [
        f32p, f32p, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, f32p, f32p,
    ]
    lib.mdi_compute_min_extents.restype = None
    lib.mdi_compute_min_extents.argtypes = [
        f32p, ctypes.c_int64, f32p, f32p, i32p, i32p, ctypes.c_int64, f32p,
    ]
    _lib = lib
    return lib


def compute_min_extents(
    positions: np.ndarray,  # [N, 3]
    viewmats: np.ndarray,  # [C, 4, 4] world->cam
    Ks: np.ndarray,  # [C, 3, 3]
    widths, heights,
) -> np.ndarray:
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float32)
    vm = np.ascontiguousarray(viewmats, np.float32).reshape(-1, 16)
    ks = np.ascontiguousarray(Ks, np.float32).reshape(-1, 9)
    w = np.ascontiguousarray(widths, np.int32)
    h = np.ascontiguousarray(heights, np.int32)
    out = np.empty(len(positions), np.float32)
    lib.mdi_compute_min_extents(
        positions, len(positions), vm, ks, w, h, len(vm), out
    )
    return out


def subsample_pointcloud(
    positions: np.ndarray,
    rgbs: np.ndarray,
    min_extents: np.ndarray,
    max_aspect_ratio: float = 1.1,
    extent_multiplier: float = 1.0,
    split_strategy: str = "spatial_median",
) -> Tuple[np.ndarray, np.ndarray]:
    """KD-split merge. split_strategy: spatial_median (reference default) |
    equal_num_pts | max_gap (reference impl.cpp:248-310)."""
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float32)
    rgbs = np.ascontiguousarray(rgbs, np.float32)
    ext = np.ascontiguousarray(min_extents, np.float32)
    if positions.ndim != 2 or positions.shape[1] != 3:
        raise ValueError(f"positions must be [N,3], got {positions.shape}")
    if rgbs.shape != positions.shape:
        raise ValueError("rgbs must match positions shape")
    n = len(positions)
    out_p = np.empty((n, 3), np.float32)
    out_c = np.empty((n, 3), np.float32)
    strategies = {"spatial_median": 0, "equal_num_pts": 1, "max_gap": 2}
    m = lib.mdi_subsample_pointcloud_ex(
        positions, rgbs, ext, n,
        float(max_aspect_ratio), float(extent_multiplier),
        strategies[split_strategy], out_p, out_c,
    )
    return out_p[:m].copy(), out_c[:m].copy()
