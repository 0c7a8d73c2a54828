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
from . import three_interpolation as _three_interpolation
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


class openpoints_pointops(pointops):
    """``openpoints.cpp.pointops.functions.pointops`` helper API (reference
    ``:106-259``) — the N4 superset: ``querygroup``/``queryandgroup``/
    ``interpolation`` plus the vector-attention ``subtraction``/
    ``aggregation`` ops.

    Layout note: the reference uses flat ``(n, 3)`` arrays with batch
    ``offset`` vectors; this rebuild is dense-batched ``(B, n, 3)`` throughout
    (SURVEY §2a mapping note), so the ``offset``/``new_offset`` arguments are
    accepted for signature parity and ignored.  2-D inputs are treated as a
    single batch and returned 2-D."""

    @staticmethod
    def _batched(*arrs):
        squeeze = arrs[0] is not None and arrs[0].ndim == 2
        out = tuple(a[None] if (a is not None and squeeze) else a for a in arrs)
        return squeeze, out

    @staticmethod
    def queryandgroup(nsample, xyz, new_xyz, feat, idx=None, offset=None,
                      new_offset=None, use_xyz=True):
        """Group each new_xyz point's kNN neighbourhood: relative coords
        (+features) — reference ``pointops.py:152-172``.  Returns
        ``(..., m, nsample, 3+c)`` (channels-last; the reference returns the
        same values channels-first)."""
        squeeze, (xyz, new_xyz, feat) = openpoints_pointops._batched(
            xyz, new_xyz, feat)
        if new_xyz is None:
            new_xyz = xyz
        if idx is None:
            _, idx = _knn(new_xyz, xyz, nsample)
        elif idx.ndim == 2:
            idx = idx[None]
        grouped_xyz = _group(xyz, idx) - new_xyz[:, :, None, :]
        out = grouped_xyz
        if feat is not None:
            grouped_feat = _group(feat, idx)
            out = (jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
                   if use_xyz else grouped_feat)
        return out[0] if squeeze else out

    @staticmethod
    def querygroup(nsample, xyz, new_xyz, feat, offset=None, new_offset=None,
                   radius=None, query_method="knn", normalize_dp=False,
                   idx=None):
        """Reference ``pointops.py:106-149``: kNN or ball query + grouping,
        optional relative-coordinate normalization; returns
        ``(grouped_xyz, grouped_feat)``."""
        squeeze, (xyz, new_xyz, feat) = openpoints_pointops._batched(
            xyz, new_xyz, feat)
        if new_xyz is None:
            new_xyz = xyz
        if idx is None:
            if query_method in ("knn", "knnquery"):
                _, idx = _knn(new_xyz, xyz, nsample)
            else:
                idx = _ball_query(radius, nsample, xyz, new_xyz)
        elif idx.ndim == 2:
            idx = idx[None]
        grouped_xyz = _group(xyz, idx) - new_xyz[:, :, None, :]
        if normalize_dp:
            if query_method in ("knn", "knnquery"):
                max_dist = jnp.max(
                    jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True),
                    axis=-2, keepdims=True) + 1e-8
            else:
                max_dist = radius
            grouped_xyz = grouped_xyz / max_dist
        grouped_feat = _group(feat, idx) if feat is not None else None
        if squeeze:
            return grouped_xyz[0], (None if grouped_feat is None
                                    else grouped_feat[0])
        return grouped_xyz, grouped_feat

    @staticmethod
    def interpolation(xyz, new_xyz, feat, offset=None, new_offset=None, k=3):
        """Inverse-distance k-NN interpolation (reference
        ``pointops.py:245-259``); k=3 matches ``three_interpolation``."""
        squeeze, (xyz, new_xyz, feat) = openpoints_pointops._batched(
            xyz, new_xyz, feat)
        if k == 3:
            out = _three_interpolation(new_xyz, xyz, feat)
        else:
            dist, idx = _knn(new_xyz, xyz, k)
            w = 1.0 / (dist + 1e-8)
            w = w / jnp.sum(w, axis=-1, keepdims=True)           # (B, n, k)
            out = jnp.sum(_group(feat, idx) * w[..., None], axis=2)
        return out[0] if squeeze else out

    @staticmethod
    def subtraction(feat1, feat2, idx):
        from .vector_attn import subtraction as _sub

        return _sub(feat1, feat2, idx)

    @staticmethod
    def aggregation(feat, weight, idx):
        from .vector_attn import aggregation as _agg

        return _agg(feat, weight, idx)


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
