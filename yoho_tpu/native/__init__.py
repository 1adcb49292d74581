"""ctypes binding for the native host runtime (voxelhost.cpp).

Compiles the shared library on first import (g++ -O3) and caches the
.so next to the source. Every entry point has a pure-numpy fallback, so
the framework works without a toolchain — the native path is a
performance tier, mirroring how the reference's Python layer sits on
MinkowskiEngine's C++ core.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxelhost.cpp")
_SO = os.path.join(_DIR, "libvoxelhost.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            i64 = ctypes.c_int64
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.yoho_prevoxelize.restype = i64
            lib.yoho_prevoxelize.argtypes = [f32p, i64, ctypes.c_float, i64p, i64]
            lib.yoho_mine_pairs.restype = i64
            lib.yoho_mine_pairs.argtypes = [f32p, i64p, i64, f32p, i64, ctypes.c_float, i64p, i64]
            lib.yoho_pca_sigma.restype = None
            lib.yoho_pca_sigma.argtypes = [f32p, i64, f32p, i64, ctypes.c_float, f32p]
            lib.yoho_radius_pairs.restype = i64
            lib.yoho_radius_pairs.argtypes = [f32p, i64, f32p, i64, ctypes.c_float, i64p, i64]
            _lib = lib
        except Exception as e:  # toolchain missing / compile error
            print(f"[yoho_tpu.native] falling back to numpy: {e}")
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def prevoxelize_indices(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """First-occurrence representative index per voxel (insertion order)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        out = np.empty(len(pts), np.int64)
        m = lib.yoho_prevoxelize(pts, len(pts), np.float32(voxel_size), out, len(pts))
        return out[:m]
    vox = np.floor(pts / voxel_size).astype(np.int64)
    _, first = np.unique(vox, axis=0, return_index=True)
    return np.sort(first)


def mine_nn_pairs(
    pc0: np.ndarray, sel: np.ndarray, pc1: np.ndarray, dist: float, max_pairs: int
) -> np.ndarray:
    """(i in sel, nearest j in pc1 within dist) pairs."""
    lib = _load()
    p0 = np.ascontiguousarray(pc0, np.float32)
    p1 = np.ascontiguousarray(pc1, np.float32)
    s = np.ascontiguousarray(sel, np.int64)
    if lib is not None:
        out = np.empty((max_pairs, 2), np.int64)
        m = lib.yoho_mine_pairs(
            p0, s, len(s), p1, len(p1), np.float32(dist), out.reshape(-1), max_pairs
        )
        return out[:m]
    d = np.linalg.norm(p0[s][:, None, :] - p1[None, :, :], axis=-1)
    j = d.argmin(1)
    ok = d[np.arange(len(s)), j] < dist
    return np.stack([s[ok], j[ok]], axis=1)


def pca_sigma(points: np.ndarray, keys: np.ndarray, radius: float = 0.3) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    ks = np.ascontiguousarray(keys, np.float32)
    if lib is not None:
        out = np.empty(len(ks), np.float32)
        lib.yoho_pca_sigma(pts, len(pts), ks, len(ks), np.float32(radius), out)
        return out
    from yoho_tpu.data.trainset import local_pca_sigma

    return local_pca_sigma(pts, ks, radius).astype(np.float32)


def radius_pairs(k0: np.ndarray, k1: np.ndarray, dist: float, max_pairs: int = 1 << 20) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(k0, np.float32)
    b = np.ascontiguousarray(k1, np.float32)
    if lib is not None:
        out = np.empty((max_pairs, 2), np.int64)
        m = lib.yoho_radius_pairs(a, len(a), b, len(b), np.float32(dist), out.reshape(-1), max_pairs)
        return out[:m]
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    ii, jj = np.where(d < dist)
    return np.stack([ii, jj], axis=1)
