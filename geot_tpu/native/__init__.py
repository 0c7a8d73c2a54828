"""Native (C++) host-side components, bound via ctypes.

The reference ships CUDA/C++ extensions for its host-side data path (open3d IO
and the ``grid_subsampling`` CPython extension,
``openpoints/cpp/subsampling/wrapper.cpp``); here the equivalents are plain
C++ compiled once into ``libgeot_native.so`` next to this file.  Everything
degrades gracefully to the numpy fallbacks in ``geot_tpu.data.io`` /
``geot_tpu.ops.subsample`` if the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgeot_native.so")
_SOURCES = ["obj_loader.cpp", "grid_subsample.cpp"]
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building on first use) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        newest_src = max(os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.obj_count_vertices.restype = ctypes.c_long
        lib.obj_count_vertices.argtypes = [ctypes.c_char_p]
        lib.obj_load_vertices.restype = ctypes.c_long
        lib.obj_load_vertices.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.grid_subsample.restype = ctypes.c_long
        lib.grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_long]
        _lib = lib
        return _lib


class obj_loader:
    """Namespace used by ``geot_tpu.data.io.load_obj_vertices``."""

    @staticmethod
    def load_vertices(path: str):
        lib = get_lib()
        if lib is None:
            return None
        n = lib.obj_count_vertices(path.encode())
        if n < 0:
            return None
        out = np.empty((n, 3), dtype=np.float32)
        got = lib.obj_load_vertices(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        if got < 0:
            return None
        return out[:got]


def grid_subsample_native(points: np.ndarray, features=None, labels=None,
                          sample_dl: float = 0.1, num_classes: int = 17):
    """C++ voxel pooling; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = len(points)
    fdim = 0
    fptr = ctypes.POINTER(ctypes.c_float)()
    if features is not None:
        features = np.ascontiguousarray(features, dtype=np.float32)
        fdim = features.shape[1]
        fptr = features.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lptr = ctypes.POINTER(ctypes.c_int)()
    if labels is not None:
        labels = np.ascontiguousarray(labels, dtype=np.int32)
        lptr = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    capacity = n
    out_p = np.empty((capacity, 3), dtype=np.float32)
    out_f = (np.empty((capacity, fdim), dtype=np.float32)
             if features is not None else None)
    out_l = np.empty((capacity,), dtype=np.int32) if labels is not None else None
    got = lib.grid_subsample(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, fdim,
        fptr, lptr, num_classes, sample_dl,
        out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if out_f is not None
        else ctypes.POINTER(ctypes.c_float)(),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int)) if out_l is not None
        else ctypes.POINTER(ctypes.c_int)(),
        capacity)
    if got < 0:
        return None
    outs = [out_p[:got]]
    if out_f is not None:
        outs.append(out_f[:got])
    if out_l is not None:
        outs.append(out_l[:got])
    return outs[0] if len(outs) == 1 else tuple(outs)
