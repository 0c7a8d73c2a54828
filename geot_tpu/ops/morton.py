"""Morton (Z-order) spatial sorting.

Shared preprocessing for the bucket-pruned Pallas kernels (FPS, small-k kNN):
sorting a cloud by Morton code makes contiguous runs of points spatially
coherent, so a fixed-size "bucket" (one (8, 128) vreg = 1024 points) has a
tight bounding box and conservative box-distance bounds can exactly skip the
bucket's distance updates (QuickFPS-style pruning, redesigned for the TPU's
vector-register granularity).

No reference counterpart: the CUDA kernels (``pointops/src/sampling``) brute
force every point every step; this is the TPU-first replacement.
"""
from __future__ import annotations

import jax.numpy as jnp


def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each int32 lane out to every 3rd bit."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(xyz: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, N, 3) float -> (B, N) int32 Morton codes (10 bits per axis).

    Coordinates are normalised per cloud to the valid points' bounding box.
    Invalid (padded) points get the maximal code so they sort last.
    """
    xyz = xyz.astype(jnp.float32)
    if valid is not None:
        big = jnp.float32(3e38)
        mn = jnp.min(jnp.where(valid[..., None], xyz, big), axis=1, keepdims=True)
        mx = jnp.max(jnp.where(valid[..., None], xyz, -big), axis=1, keepdims=True)
    else:
        mn = jnp.min(xyz, axis=1, keepdims=True)
        mx = jnp.max(xyz, axis=1, keepdims=True)
    scale = 1023.0 / jnp.maximum(mx - mn, 1e-9)
    q = jnp.clip(((xyz - mn) * scale), 0.0, 1023.0).astype(jnp.int32)
    code = (_spread3(q[..., 0]) | (_spread3(q[..., 1]) << 1)
            | (_spread3(q[..., 2]) << 2))
    if valid is not None:
        code = jnp.where(valid, code, jnp.int32(0x7FFFFFFF))
    return code


def spatial_sort(xyz: jnp.ndarray):
    """(B, N, 3) -> (sorted_xyz, order) with order (B, N) int32 such that
    sorted_xyz[b, i] = xyz[b, order[b, i]]."""
    code = morton_codes(xyz)
    order = jnp.argsort(code, axis=-1).astype(jnp.int32)
    return jnp.take_along_axis(xyz, order[..., None], axis=1), order
