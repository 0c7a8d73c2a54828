"""Subsampling layer API (reference: ``openpoints/models/layers/subsample.py``).

``furthest_point_sample`` returns indices like the CUDA wrapper at
``subsample.py:76``; ``random_sample`` mirrors ``subsample.py:70`` but takes an
explicit PRNG key (JAX randomness is never global).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import fps as _fps


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 indices."""
    return _fps(xyz, npoint)


def random_sample(xyz: jnp.ndarray, npoint: int, rng: jax.Array) -> jnp.ndarray:
    B, N = xyz.shape[0], xyz.shape[1]
    keys = jax.random.split(rng, B)
    return jax.vmap(lambda k: jax.random.choice(k, N, (npoint,), replace=False))(keys)
