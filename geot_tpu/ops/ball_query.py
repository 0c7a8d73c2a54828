"""Ball query with first-hit padding.

Replaces ``query_ball_point_kernel``
(reference ``pointnet2/_ext_src/src/ball_query_gpu.cu:12``): for each query
point, take the first ``nsample`` support indices (in index order) whose
squared distance is < radius^2; slots past the last hit are filled with the
*first* hit's index. Queries with zero hits return index 0 everywhere (the
CUDA kernel leaves uninitialised memory there; 0 is the safe fixed-shape
choice and matches common reimplementations).

Fixed-shape TPU formulation: "first k valid indices" == top-k of
``-index`` over the valid mask, streamed over support chunks like knn.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .knn import pairwise_dist2


def _ball_query_single(query, support, radius, nsample, chunk_size):
    Q = query.shape[0]
    N = support.shape[0]
    r2 = radius * radius

    num_chunks = max(-(-N // chunk_size), 1)
    pad = num_chunks * chunk_size - N
    support_p = jnp.pad(support, ((0, pad), (0, 0)))
    chunk_iota = lax.broadcasted_iota(jnp.int32, (1, chunk_size), 1)
    BIG = jnp.int32(2 ** 30)

    def body(c, best_key):
        sup = lax.dynamic_slice(support_p, (c * chunk_size, 0),
                                (chunk_size, support.shape[1]))
        d2 = pairwise_dist2(query, sup)
        idx = c * chunk_size + chunk_iota                   # (1, chunk)
        valid = (d2 < r2) & (idx < N)
        # smaller index = better; invalid -> BIG
        key = jnp.where(valid, jnp.broadcast_to(idx, d2.shape), BIG)
        merged = jnp.concatenate([best_key, key], axis=1)
        neg, _ = lax.top_k(-merged, nsample)
        return -neg

    init = jnp.full((Q, nsample), BIG, dtype=jnp.int32)
    keys = lax.fori_loop(0, num_chunks, body, init)          # ascending indices
    found = keys < BIG
    first = jnp.where(found[:, :1], keys[:, :1], 0)          # first hit or 0
    return jnp.where(found, keys, first).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "chunk_size"))
def ball_query(radius: float, nsample: int, support: jnp.ndarray,
               query: jnp.ndarray, chunk_size: int = 2048) -> jnp.ndarray:
    """Batched ball query.

    Args (ordered like the reference ``ball_query(radius, nsample, xyz, new_xyz)``):
        radius: search radius (static).
        nsample: neighbours per query (static).
        support: (B, N, 3) points searched over.
        query: (B, M, 3) ball centers.
    Returns:
        (B, M, nsample) int32 indices.
    """
    f = functools.partial(_ball_query_single, radius=radius, nsample=nsample,
                          chunk_size=chunk_size)
    return jax.vmap(f)(query.astype(jnp.float32), support.astype(jnp.float32))
