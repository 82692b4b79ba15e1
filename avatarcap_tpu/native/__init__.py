"""Native (C++) host-side geometry acceleration.

Builds bvh.cpp on first use (g++ -O3 -fopenmp, cached next to the source)
and exposes BVH closest-point / signed-distance queries via ctypes. The
preprocessing pipeline prefers this path; the pure-JAX implementations in
avatarcap_tpu.ops.closest_point remain as a fallback and as the on-device
option.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libavatarbvh.so")
_SRC = os.path.join(_DIR, "bvh.cpp")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                     "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, text=True)
            lib = ctypes.CDLL(_SO)
            lib.bvh_build.restype = ctypes.c_void_p
            lib.bvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            lib.bvh_free.argtypes = [ctypes.c_void_p]
            lib.bvh_closest_points.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.bvh_signed_distance.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            _build_error = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


class MeshBVH:
    """BVH over a triangle mesh for batched host queries."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native BVH unavailable: {_build_error}")
        self._lib = lib
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._faces = np.ascontiguousarray(faces, np.int32)
        self._handle = ctypes.c_void_p(lib.bvh_build(
            _fptr(self._verts), len(self._verts),
            _iptr(self._faces), len(self._faces)))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bvh_free(self._handle)
            self._handle = None

    def closest_points(self, queries: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
        """-> (points (N,3), face_idx (N,), bary (N,3), dist (N,))."""
        q = np.ascontiguousarray(queries, np.float32)
        n = len(q)
        pts = np.empty((n, 3), np.float32)
        fid = np.empty((n,), np.int32)
        bary = np.empty((n, 3), np.float32)
        dist = np.empty((n,), np.float32)
        self._lib.bvh_closest_points(self._handle, _fptr(q), n, _fptr(pts),
                                     _iptr(fid), _fptr(bary), _fptr(dist))
        return pts, fid, bary, dist

    def signed_distance(self, queries: np.ndarray) -> np.ndarray:
        """Inside-positive signed distance (N,)."""
        q = np.ascontiguousarray(queries, np.float32)
        n = len(q)
        sdf = np.empty((n,), np.float32)
        self._lib.bvh_signed_distance(self._handle, _fptr(q), n, _fptr(sdf))
        return sdf
