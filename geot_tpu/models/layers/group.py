"""Grouping layers (reference: ``openpoints/models/layers/group.py:206-360``).

All channels-last: groupers return ``grouped_xyz (B, M, K, 3)`` and
``grouped_features (B, M, K, C)`` (the reference returns ``(B, 3, M, K)`` /
``(B, C, M, K)``).
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from ...ops import ball_query, grouping_operation, knn


class QueryAndGroup:
    """Ball-query grouping (reference ``group.py:206``)."""

    def __init__(self, radius: float, nsample: int, relative_xyz: bool = True,
                 normalize_dp: bool = False, return_only_idx: bool = False,
                 **kwargs):
        self.radius = radius
        self.nsample = nsample
        self.relative_xyz = relative_xyz
        self.normalize_dp = normalize_dp
        self.return_only_idx = return_only_idx

    def __call__(self, query_xyz, support_xyz, features=None):
        idx = ball_query(self.radius, self.nsample, support_xyz, query_xyz)
        if self.return_only_idx:
            return idx
        grouped_xyz = grouping_operation(support_xyz, idx)       # (B, M, K, 3)
        if self.relative_xyz:
            grouped_xyz = grouped_xyz - query_xyz[:, :, None, :]
            if self.normalize_dp:
                grouped_xyz = grouped_xyz / self.radius
        grouped_features = grouping_operation(features, idx) if features is not None else None
        return grouped_xyz, grouped_features


class KNNGroup:
    """kNN grouping (reference ``group.py:275``)."""

    def __init__(self, nsample: int, relative_xyz: bool = True,
                 normalize_dp: bool = False, return_only_idx: bool = False,
                 **kwargs):
        self.nsample = nsample
        self.relative_xyz = relative_xyz
        self.normalize_dp = normalize_dp
        self.return_only_idx = return_only_idx

    def __call__(self, query_xyz, support_xyz, features=None):
        _, idx = knn(query_xyz, support_xyz, self.nsample)
        if self.return_only_idx:
            return idx
        grouped_xyz = grouping_operation(support_xyz, idx)
        if self.relative_xyz:
            grouped_xyz = grouped_xyz - query_xyz[:, :, None, :]
        if self.normalize_dp:
            # per-cloud max neighbour distance (reference ``group.py:317``)
            norm = jnp.sqrt(jnp.sum(grouped_xyz ** 2, axis=-1))
            m = jnp.max(norm, axis=(1, 2))[:, None, None, None]
            grouped_xyz = grouped_xyz / m
        grouped_features = grouping_operation(features, idx) if features is not None else None
        return grouped_xyz, grouped_features


class GroupAll:
    """Single-group fallback (reference ``group.py:258``)."""

    def __call__(self, new_xyz, xyz, features=None):
        grouped_xyz = xyz[:, None, :, :]                         # (B, 1, N, 3)
        grouped_features = features[:, None, :, :] if features is not None else None
        return grouped_xyz, grouped_features


def get_aggregation_features(p, dp, f, fj, feature_type: str = "dp_fj"):
    """Neighbourhood feature assembly (reference ``group.py:323``,
    spelled ``get_aggregation_feautres`` there). channels-last:
    p (B, M, 3), dp (B, M, K, 3), f (B, M, C), fj (B, M, K, C)."""
    if feature_type == "dp_fj":
        return jnp.concatenate([dp, fj], axis=-1)
    if feature_type == "dp_fj_df":
        df = fj - f[:, :, None, :]
        return jnp.concatenate([dp, fj, df], axis=-1)
    if feature_type == "pi_dp_fj_df":
        df = fj - f[:, :, None, :]
        pi = jnp.broadcast_to(p[:, :, None, :], dp.shape[:3] + (p.shape[-1],))
        return jnp.concatenate([pi, dp, fj, df], axis=-1)
    if feature_type == "dp_df":
        df = fj - f[:, :, None, :]
        return jnp.concatenate([dp, df], axis=-1)
    raise ValueError(f"unknown feature_type {feature_type}")


def create_grouper(group_args):
    """Factory mirroring ``create_grouper`` (reference ``group.py:338``)."""
    args = copy.deepcopy(dict(group_args))
    method = args.pop("NAME", "ballquery")
    radius = args.pop("radius", 0.1)
    nsample = args.pop("nsample", 20)
    if nsample is not None:
        if method == "ballquery":
            return QueryAndGroup(radius, nsample, **args)
        if method == "knn":
            return KNNGroup(nsample, **args)
        raise ValueError(f"unknown grouper {method}")
    return GroupAll()
