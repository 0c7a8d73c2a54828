"""Host-side subsampling utilities.

``grid_subsample`` replaces the C++ CPU extension ``grid_subsampling``
(reference ``openpoints/cpp/subsampling/grid_subsampling/grid_subsampling.cpp``,
wrapper ``openpoints/cpp/subsampling/wrapper.cpp:27``): voxel-grid pooling that
returns the barycenter of points (and mean features / majority labels) per
occupied voxel.  Runs on the host as part of data preprocessing, so it is
numpy — vectorised with ``np.unique`` rather than the reference's hash-map
loop.  A C++ fast path can be layered under this API if profiling demands it.

``random_sample`` mirrors ``random_sample``
(reference ``openpoints/models/layers/subsample.py:70``).
"""
from __future__ import annotations

import numpy as np


def grid_subsample(points: np.ndarray, features: np.ndarray | None = None,
                   labels: np.ndarray | None = None, sample_dl: float = 0.1,
                   num_classes: int | None = None):
    """Voxel-grid subsampling on the host.

    Args:
        points: (N, 3) float32.
        features: optional (N, F).
        labels: optional (N,) int.
        sample_dl: voxel edge length.
    Returns:
        sub_points [, sub_features][, sub_labels] — barycenters, feature means
        and per-voxel label histograms' argmax (the reference accumulates a
        per-voxel label count and returns the max count label).
    """
    points = np.asarray(points, dtype=np.float32)
    origin = points.min(axis=0)
    coords = np.floor((points - origin) / sample_dl).astype(np.int64)
    # linearize voxel coords
    dims = coords.max(axis=0) + 1
    lin = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inv, counts = np.unique(lin, return_inverse=True, return_counts=True)
    V = uniq.shape[0]

    sub_points = np.zeros((V, 3), dtype=np.float64)
    np.add.at(sub_points, inv, points)
    sub_points = (sub_points / counts[:, None]).astype(np.float32)

    out = [sub_points]
    if features is not None:
        features = np.asarray(features)
        sub_feat = np.zeros((V, features.shape[1]), dtype=np.float64)
        np.add.at(sub_feat, inv, features)
        out.append((sub_feat / counts[:, None]).astype(features.dtype))
    if labels is not None:
        labels = np.asarray(labels).astype(np.int64)
        C = num_classes if num_classes is not None else int(labels.max()) + 1
        hist = np.zeros((V, C), dtype=np.int64)
        np.add.at(hist, (inv, labels), 1)
        out.append(hist.argmax(axis=1).astype(np.int32))
    return out[0] if len(out) == 1 else tuple(out)


def random_sample(num_points: int, npoint: int, rng: np.random.Generator | None = None):
    rng = rng or np.random.default_rng()
    return rng.choice(num_points, npoint, replace=num_points < npoint)
