"""Point-Transformer vector-attention primitives: pairwise subtraction and
weighted neighbourhood aggregation.

Replaces the ``subtraction`` / ``aggregation`` CUDA fwd+bwd kernels of the
offset-batched pointops stack (reference
``openpoints/cpp/pointops/functions/pointops.py:175-242``,
``openpoints/cpp/pointops/src/{subtraction,aggregation}/``).  In dense
fixed-shape layout both are one gather + one elementwise/matvec, fully
fusible and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

from .group import grouping_operation


def subtraction(feat1: jnp.ndarray, feat2: jnp.ndarray, idx: jnp.ndarray):
    """feat1 (B, N, C) centers, feat2 (B, N, C) support, idx (B, N, K)
    -> (B, N, K, C) of ``feat1[i] - feat2[idx[i, k]]``."""
    neigh = grouping_operation(feat2, idx)
    return feat1[:, :, None, :] - neigh


def aggregation(feat: jnp.ndarray, weight: jnp.ndarray, idx: jnp.ndarray):
    """Weighted neighbourhood sum with channel-sharing weights.

    feat (B, N, C), weight (B, N, K, C') with C = C' * s shared channels,
    idx (B, N, K) -> (B, N, C):  out[i, c] = sum_k w[i, k, c//s] * feat[idx[i,k], c].
    """
    B, N, K = idx.shape
    C = feat.shape[-1]
    Cp = weight.shape[-1]
    s = C // Cp
    neigh = grouping_operation(feat, idx)                # (B, N, K, C)
    neigh = neigh.reshape(B, N, K, Cp, s)
    out = jnp.sum(neigh * weight[..., None], axis=2)      # (B, N, Cp, s)
    return out.reshape(B, N, C)
