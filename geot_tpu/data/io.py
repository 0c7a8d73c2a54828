"""Point-cloud file IO.

The reference reads ``.obj`` scans through open3d and labels through json
(``openpoints/dataset/io.py``).  open3d is not available here (and is a heavy
C++ dependency for what is just vertex parsing), so ``load_obj_vertices`` is a
numpy fast path; ``geot_tpu.native`` provides a C++ parser for large scans
(see ``native/README``) which this module uses when built.
"""
from __future__ import annotations

import json
import os

import numpy as np


def load_obj_vertices(path: str) -> np.ndarray:
    """Parse ``v x y z`` lines of an OBJ file -> (N, 3) float32."""
    try:
        from ..native import obj_loader  # C++ fast path
        verts = obj_loader.load_vertices(path)
        if verts is not None:
            return verts
    except Exception:
        pass
    verts = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
    return np.asarray(verts, dtype=np.float32)


def load_labels_json(path: str):
    """Teeth3DS ground-truth json: {'labels': [...], ...}."""
    with open(path, "r") as f:
        return json.load(f)


class IO:
    """Extension-dispatch loader matching the reference surface
    (``openpoints/dataset/io.py``)."""

    @classmethod
    def get(cls, path: str):
        ext = os.path.splitext(path)[1].lower()
        if ext == ".obj":
            return load_obj_vertices(path)
        if ext == ".json":
            return load_labels_json(path)
        if ext == ".npy":
            return np.load(path)
        if ext == ".npz":
            return np.load(path)["data"]
        if ext == ".txt":
            return np.loadtxt(path, dtype=np.float32)
        raise ValueError(f"unsupported extension {ext} ({path})")
