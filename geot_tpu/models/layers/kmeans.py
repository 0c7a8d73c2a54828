"""Fixed-iteration k-means (reference: ``openpoints/models/layers/kmeans.py``).

The reference loops until convergence with a dynamic tolerance check; under
jit the iteration count is static (``lax.fori_loop``), which is both
TPU-friendly and deterministic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ...ops import pairwise_dist2


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x: jnp.ndarray, k: int, iters: int = 10, rng=None):
    """x (N, C) -> (assignments (N,), centers (k, C)).

    Initialisation: first k points (deterministic) or a random permutation
    when ``rng`` is given.
    """
    N, C = x.shape
    if rng is not None:
        init_idx = jax.random.choice(rng, N, (k,), replace=False)
    else:
        init_idx = jnp.arange(k)
    centers0 = x[init_idx]

    def body(_, centers):
        d2 = pairwise_dist2(x, centers)                  # (N, k)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        sums = onehot.T @ x
        counts = jnp.sum(onehot, axis=0)[:, None]
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)

    centers = lax.fori_loop(0, iters, body, centers0)
    assign = jnp.argmin(pairwise_dist2(x, centers), axis=1)
    return assign, centers
