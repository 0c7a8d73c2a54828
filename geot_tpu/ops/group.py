"""Gather / grouping ops — pure indexing, differentiable by construction.

Replaces ``gather_operation`` / ``grouping_operation`` and their hand-written
backward kernels (reference ``pointnet2/pointnet2_utils.py:80-254``,
``openpoints/cpp/pointnet2_batch/src/group_points*``).

Convention note: the reference is channels-first ``(B, C, N)``; this rebuild
is channels-last ``(B, N, C)`` throughout (TPU-friendly: the channel dim maps
onto the 128-wide lane dimension and matmuls need no transposes).
"""
from __future__ import annotations

import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def grouping_operation(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M, K) -> (B, M, K, C).

    Equivalent of ``grouping_operation`` (reference
    ``pointnet2/pointnet2_utils.py:206``) in channels-last layout.
    """
    B, M, K = idx.shape
    flat = idx.reshape(B, M * K)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(B, M, K, points.shape[-1])


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Alias matching ``pointops.index_points`` semantics
    (reference ``pointops/functions/pointops.py:47``): idx may be (B, M) or
    (B, M, K)."""
    if idx.ndim == 2:
        return gather_points(points, idx)
    return grouping_operation(points, idx)


def torch_grouping_operation(features: jnp.ndarray,
                             idx: jnp.ndarray) -> jnp.ndarray:
    """Channels-FIRST grouping kept verbatim for API parity
    (reference ``openpoints/models/layers/group.py:120``, exported at
    ``layers/__init__.py:10``): features (B, C, N), idx (B, M, K)
    -> (B, C, M, K)."""
    out = grouping_operation(jnp.swapaxes(features, 1, 2), idx)  # (B,M,K,C)
    return jnp.transpose(out, (0, 3, 1, 2))
