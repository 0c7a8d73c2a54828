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
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith(("v ", "v\t")):
                parts = line.split()
                try:
                    # first 3 coordinates; extra fields (w, vertex colors)
                    # are ignored.  Malformed vertex lines are SKIPPED, not
                    # emitted as garbage — same semantics as the native
                    # parser (obj_loader.cpp).
                    verts.append((float(parts[1]), float(parts[2]),
                                  float(parts[3])))
                except (ValueError, IndexError):
                    continue
    return np.asarray(verts, dtype=np.float32).reshape(-1, 3)


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
        if ext == ".h5":
            import h5py

            with h5py.File(path, "r") as f:
                return f["data"][()]
        if ext == ".ply":
            return _read_ply_xyz(path)
        raise ValueError(f"unsupported extension {ext} ({path})")


def _read_ply_xyz(path: str) -> np.ndarray:
    """Minimal binary/ascii PLY vertex reader (x, y, z properties) — the
    reference routes .ply through open3d; this keeps IO dependency-free."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(h.split()[-1]) for h in header
                 if h.startswith("element vertex"))
        fmt = next(h.split()[1] for h in header if h.startswith("format"))
        props = [h.split()[-1] for h in header
                 if h.startswith("property") and "list" not in h]
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n, dtype=np.float64)
            rows = rows.reshape(n, -1)
        else:
            endian = ">" if "big_endian" in fmt else "<"
            ply_types = {  # full PLY scalar-type table, both spellings
                "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
                "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
                "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
                "float": "f4", "float32": "f4",
                "double": "f8", "float64": "f8",
            }
            dt = np.dtype([(p, endian + ply_types[h.split()[1]])
                           for h, p in zip(
                               [h for h in header if h.startswith("property")
                                and "list" not in h], props)])
            rows = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            rows = np.stack([rows[p].astype(np.float64) for p in props], -1)
        cols = [props.index(c) for c in ("x", "y", "z")]
        return rows[:, cols].astype(np.float32)

