"""three_nn / three_interpolate — inverse-distance-weighted 3-NN feature
propagation.

Replaces the CUDA pair ``three_nn`` / ``three_interpolate`` and their
hand-written gradients (reference ``pointnet2/pointnet2_utils.py:117-203``,
``openpoints/cpp/pointnet2_batch/src/interpolate*``): here interpolation is a
gather + weighted sum, so autodiff produces the scatter-add backward for free.
"""
from __future__ import annotations

import jax.numpy as jnp

from .knn import knn



def three_nn(unknown: jnp.ndarray, known: jnp.ndarray, chunk_size: int = 2048):
    """(B, n, 3), (B, m, 3) -> dist (B, n, 3), idx (B, n, 3) — euclidean,
    ascending (reference ``pointnet2/pointnet2_utils.py:117``)."""
    return knn(unknown, known, 3, chunk_size=chunk_size, squared=False)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """features (B, m, C), idx (B, n, 3), weight (B, n, 3) -> (B, n, C).

    Channels-last equivalent of ``three_interpolate``
    (reference ``pointnet2/pointnet2_utils.py:149``).
    """
    # per-neighbour gather + fused multiply-accumulate, in the FEATURE dtype:
    # one (B, n, 3, C) intermediate would cost a T(4,128) relayout + f32
    # upcast — on the 16k/384-d flagship propagation that tripled HBM traffic
    # (profiled 0.53 ms -> ~0.15 ms for propagation_0)
    w = weight.astype(features.dtype)
    out = None
    for j in range(idx.shape[-1]):
        gj = jnp.take_along_axis(features, idx[..., j:j + 1], axis=1)
        term = gj * w[..., j:j + 1]
        out = term if out is None else out + term
    return out


def three_interpolation(unknown_xyz: jnp.ndarray, known_xyz: jnp.ndarray,
                        known_features: jnp.ndarray, eps: float = 1e-8,
                        chunk_size: int = 2048) -> jnp.ndarray:
    """Fused helper: 3-NN + inverse-distance weights + interpolate, the exact
    recipe of ``PointnetFPModule.forward`` (reference
    ``pointnet2/pointnet2_modules.py:601-627``) and ``three_interpolation``
    (``openpoints/models/layers/upsampling.py``)."""
    dist, idx = three_nn(unknown_xyz, known_xyz, chunk_size=chunk_size)
    dist_recip = 1.0 / (dist + eps)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    return three_interpolate(known_features, idx, weight)
