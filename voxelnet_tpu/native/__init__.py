"""Native (C++) host-pipeline kernels, loaded via ctypes.

The reference's host pipeline is pure Python (its per-point dict-loop
voxelizer, voxelnet/utils.py:10-100, costs ~1.6 s/frame); this package
holds the C++ fast paths for the host side of the framework — currently
the voxelizer that feeds the `train.host_voxelize` production train path.

The shared library is built on demand with the system g++ (this image has
no pybind11 and no pip; plain C ABI + ctypes keeps the binding
dependency-free) and cached next to the source. `available()` never
raises: environments without a toolchain silently fall back to the NumPy
twin (ops/voxelize.voxelize_np).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxelize.cpp")
_LIB = os.path.join(_DIR, "_voxelize.so")

_lock = threading.Lock()
_lib = None          # ctypes.CDLL once loaded
_load_failed = False


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    stale = (not os.path.exists(_LIB)
             or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
    if force or stale:
        # per-process tmp name: concurrent builders (multi-host tests, a
        # trainer + a CLI tool on a fresh checkout) each write their own
        # file; the os.replace below is the only shared step and is atomic
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", tmp, _SRC],
            check=True, capture_output=True)
        os.replace(tmp, _LIB)  # atomic: concurrent loaders never see a
        # half-written .so
    return _LIB


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            lib = ctypes.CDLL(build())
        except (OSError, subprocess.SubprocessError, FileNotFoundError):
            _load_failed = True
            return None
        crop = lib.voxelnet_crop_f32
        crop.restype = ctypes.c_int64
        crop.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        fn = lib.voxelnet_voxelize_f32
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # points, n
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,   # D H W
            ctypes.c_float, ctypes.c_float, ctypes.c_float,   # vsz vsy vsx
            ctypes.c_float, ctypes.c_float, ctypes.c_float,   # offx offy offz
            ctypes.c_int32, ctypes.c_int32,                   # T max_voxels
            ctypes.POINTER(ctypes.c_float),                   # features
            ctypes.POINTER(ctypes.c_int32),                   # coords
            ctypes.POINTER(ctypes.c_int32),                   # counts
            ctypes.POINTER(ctypes.c_int32),                   # k
            ctypes.POINTER(ctypes.c_int32),                   # k_raw
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True iff the native library is loadable (building it if needed)."""
    return _load() is not None


def voxelize_native(points: np.ndarray, spec, max_voxels: int):
    """Drop-in for ops/voxelize.voxelize_np(points, spec, max_voxels)
    (no-shuffle form; the dataset pre-shuffles points, dataset.py:124).

    Returns the same `Voxels` tuple: features (max_voxels, T, 7) float32,
    coords (max_voxels, 3) int32, counts (max_voxels,) int32, num_voxels,
    num_voxels_raw. Raises RuntimeError if the library is unavailable —
    call `available()` first (the dataset resolver does).
    """
    from voxelnet_tpu.ops.voxelize import Voxels  # local: avoid cycle

    lib = _load()
    if lib is None:
        raise RuntimeError("native voxelizer unavailable (g++ build failed)")
    pts = np.ascontiguousarray(
        np.asarray(points, np.float32).reshape(-1, 4))
    D, H, W = spec.grid_dzyx
    T = spec.max_points_per_voxel
    features = np.empty((max_voxels, T, 7), np.float32)
    coords = np.empty((max_voxels, 3), np.int32)
    counts = np.empty((max_voxels,), np.int32)
    k = ctypes.c_int32(0)
    k_raw = ctypes.c_int32(0)
    rc = lib.voxelnet_voxelize_f32(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)),
        D, H, W,
        ctypes.c_float(spec.voxel_size_zyx[0]),
        ctypes.c_float(spec.voxel_size_zyx[1]),
        ctypes.c_float(spec.voxel_size_zyx[2]),
        ctypes.c_float(spec.offset_xyz[0]),
        ctypes.c_float(spec.offset_xyz[1]),
        ctypes.c_float(spec.offset_xyz[2]),
        T, max_voxels,
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(k), ctypes.byref(k_raw))
    if rc != 0:
        raise RuntimeError(f"native voxelizer error code {rc}")
    return Voxels(features, coords, counts, int(k.value), int(k_raw.value))


def crop_in_grid(points: np.ndarray, spec) -> np.ndarray:
    """Native twin of `points[ops.voxelize.in_grid_mask(points, spec)]`
    (bit-identical selection AND row order — pure copies). Raises
    RuntimeError if the library is unavailable; callers go through
    ops/voxelize.crop_points, which falls back to the NumPy mask."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native voxelizer unavailable (g++ build failed)")
    pts = np.ascontiguousarray(
        np.asarray(points, np.float32).reshape(-1, 4))
    D, H, W = spec.grid_dzyx
    out = np.empty_like(pts)
    k = lib.voxelnet_crop_f32(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)),
        D, H, W,
        ctypes.c_float(spec.voxel_size_zyx[0]),
        ctypes.c_float(spec.voxel_size_zyx[1]),
        ctypes.c_float(spec.voxel_size_zyx[2]),
        ctypes.c_float(spec.offset_xyz[0]),
        ctypes.c_float(spec.offset_xyz[1]),
        ctypes.c_float(spec.offset_xyz[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:k]
