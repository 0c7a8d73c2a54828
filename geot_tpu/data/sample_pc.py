"""Mesh -> point-cloud preprocessing for the ShapeNet render datasets.

Reference ``openpoints/dataset/sample_pc.py:1-26``: reads ``.off`` meshes and
writes Poisson-disk point samples via open3d.  open3d is not in this image, so
the default path is numpy: area-weighted uniform surface sampling (init_factor
x oversampled) followed by farthest-point thinning — the same blue-noise-ish
coverage Poisson-disk sampling targets.  open3d is used when importable.
"""
from __future__ import annotations

import os

import numpy as np


def read_off(path: str):
    """Minimal OFF mesh reader -> (verts (V,3) f32, faces (F,3) i64)."""
    with open(path, "r") as f:
        first = f.readline().strip()
        if first.startswith("OFF") and len(first) > 3:
            counts = first[3:].split()          # "OFF 123 456 0" one-liners
        else:
            counts = f.readline().split()
        nv, nf = int(counts[0]), int(counts[1])
        verts = np.array([list(map(float, f.readline().split()))
                          for _ in range(nv)], dtype=np.float32)
        faces = []
        for _ in range(nf):
            row = list(map(int, f.readline().split()))
            for k in range(2, row[0]):          # fan-triangulate polygons
                faces.append((row[1], row[k], row[k + 1]))
    return verts, np.asarray(faces, dtype=np.int64)


def sample_mesh_poisson(verts: np.ndarray, faces: np.ndarray,
                        num_points: int, init_factor: int = 4,
                        rng: np.random.Generator | None = None) -> np.ndarray:
    """Area-weighted surface sampling oversampled by ``init_factor`` then
    thinned by farthest-point selection."""
    rng = rng or np.random.default_rng(0)
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    prob = area / max(area.sum(), 1e-12)
    n_dense = num_points * init_factor
    tri = rng.choice(len(faces), n_dense, p=prob)
    r1 = np.sqrt(rng.uniform(size=(n_dense, 1)))
    r2 = rng.uniform(size=(n_dense, 1))
    dense = ((1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri]
             + r1 * r2 * v2[tri]).astype(np.float32)

    import jax.numpy as jnp

    from ..ops import fps

    idx = np.asarray(fps(jnp.asarray(dense[None]), num_points))[0]
    return dense[idx]


def _write_ply_xyz(path: str, pts: np.ndarray):
    with open(path, "wb") as f:
        f.write((f"ply\nformat binary_little_endian 1.0\n"
                 f"element vertex {len(pts)}\nproperty float x\n"
                 f"property float y\nproperty float z\nend_header\n")
                .encode("ascii"))
        f.write(np.ascontiguousarray(pts, dtype="<f4").tobytes())


def sample_pc(data_dir: str, num_points: int, splits=("train", "val", "test")):
    """Reference CLI entry (``sample_pc.py:6-22``): for each ``.off`` in
    ``<data_dir>/<split>`` write ``<data_dir>/pointclouds/<split>/*.ply``."""
    try:
        import open3d as o3d                     # optional fast path
    except Exception:
        o3d = None
    save_dir = os.path.join(data_dir, "pointclouds")
    for split in splits:
        split_dir = os.path.join(data_dir, split)
        if not os.path.isdir(split_dir):
            continue
        out_dir = os.path.join(save_dir, split)
        os.makedirs(out_dir, exist_ok=True)
        for sample in sorted(os.listdir(split_dir)):
            if "off" not in sample:
                continue
            src = os.path.join(split_dir, sample)
            dst = os.path.join(out_dir, sample.replace("off", "ply"))
            if o3d is not None:
                mesh = o3d.io.read_triangle_mesh(src)
                pcd = mesh.sample_points_poisson_disk(
                    number_of_points=num_points, init_factor=4)
                o3d.io.write_point_cloud(dst, pcd)
            else:
                verts, faces = read_off(src)
                pts = sample_mesh_poisson(verts, faces, num_points)
                _write_ply_xyz(dst, pts)
