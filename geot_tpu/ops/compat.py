"""Reference-API compatibility surfaces.

Users migrating from the reference import these to keep call sites unchanged:

- ``from geot_tpu.ops.compat import pointops`` — the top-level ``pointops``
  wrapper API (``pointops/functions/pointops.py``);
- ``from geot_tpu.ops.compat import pointnet2_utils`` — the erikwijmans
  ``pointnet2.pointnet2_utils`` API (``pointnet2/pointnet2_utils.py``).

Layout notes: these match the reference *shapes* (channels-first where the
reference is channels-first), adapting to the channels-last internals.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import ball_query as _ball_query
from . import fps as _fps
from . import fps_weighted as _fps_weighted
from . import gather_points as _gather
from . import grouping_operation as _group
from . import knn as _knn
from . import three_interpolate as _three_interp
from . import three_nn as _three_nn


class pointops:
    """Top-level ``pointops`` API (reference ``pointops/functions/pointops.py``)."""

    @staticmethod
    def knn(x, src, k, transpose=False):
        """(idx, dists): for each x point the k nearest in src — reference
        ``pointops.py:7-21`` (returns squared distances)."""
        if transpose:
            x = jnp.swapaxes(x, 1, 2)
            src = jnp.swapaxes(src, 1, 2)
        d, i = _knn(x, src, k, squared=True)
        return i, d

    @staticmethod
    def fps(x, k):
        """(B, N, 3) -> sampled coords (B, k, 3) — reference ``pointops.py:24``."""
        return _gather(x, _fps(x, k))

    @staticmethod
    def fps_weight(x, k, weight=None):
        assert weight is not None, "the weight should be defined if using weighted fps"
        return _gather(x, _fps_weighted(x, weight, k))

    @staticmethod
    def index_points(points, idx):
        from .group import index_points as _ip

        return _ip(points, idx)


class pointnet2_utils:
    """``pointnet2.pointnet2_utils`` API (reference ``pointnet2_utils.py:48-288``).
    Feature tensors are channels-first (B, C, N) as in the reference."""

    @staticmethod
    def furthest_point_sample(xyz, npoint):
        return _fps(xyz, npoint)

    @staticmethod
    def gather_operation(features, idx):
        # features (B, C, N), idx (B, M) -> (B, C, M)
        out = _gather(jnp.swapaxes(features, 1, 2), idx)
        return jnp.swapaxes(out, 1, 2)

    @staticmethod
    def three_nn(unknown, known):
        return _three_nn(unknown, known)

    @staticmethod
    def three_interpolate(features, idx, weight):
        # features (B, C, m) -> (B, C, n)
        out = _three_interp(jnp.swapaxes(features, 1, 2), idx, weight)
        return jnp.swapaxes(out, 1, 2)

    @staticmethod
    def grouping_operation(features, idx):
        # features (B, C, N), idx (B, M, K) -> (B, C, M, K)
        out = _group(jnp.swapaxes(features, 1, 2), idx)     # (B, M, K, C)
        return out.transpose(0, 3, 1, 2)

    @staticmethod
    def ball_query(radius, nsample, xyz, new_xyz):
        return _ball_query(radius, nsample, xyz, new_xyz)
