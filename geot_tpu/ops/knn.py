"""Brute-force k-nearest-neighbour search, blockwise so the full pairwise
distance matrix is never materialised in HBM.

Replaces three reference implementations with one op:
- CUDA heap kNN ``knnquery_cuda`` (``pointops/src/knnquery/knnquery_cuda_kernel.cu:21``)
- ``knn_point`` (torch.cdist + topk, ``openpoints/models/layers/knn.py:7``)
- the external ``knn_cuda.KNN`` package used by the backbone tokenizer
  (``openpoints/models/backbone/transformer.py:11,280``).

Strategy: the query axis is processed in full, the *support* axis is streamed
in chunks; a running top-k of squared distances is merged per chunk with
``lax.top_k``.  Peak memory is O(Q * (chunk + k)) instead of O(Q * N) —
at 16k x 16k x fp32 that is ~34 MB per 2048-chunk instead of 1 GB.
The distance computation is a matmul (``-2 q @ s^T``) so it lands on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_dist2(query: jnp.ndarray, support: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances, shape (..., Q, N).

    Two regimes:
    - low-dim geometry (C <= 4): direct per-dimension differences — exact
      (coincident points give exactly 0, which the three_nn eval path relies
      on) and only 3 fused VPU ops per element.
    - high-dim features: the |q|^2 - 2 q.s + |s|^2 expansion so the cross
      term lands on the MXU.  HIGHEST precision because the default TPU f32
      matmul runs bf16 passes, which perturbs neighbour ordering.
    """
    C = query.shape[-1]
    if C <= 4:
        diff = query[..., :, None, :] - support[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)          # (..., Q, 1)
    s2 = jnp.sum(support * support, axis=-1, keepdims=True)      # (..., N, 1)
    cross = jnp.matmul(query, jnp.swapaxes(support, -1, -2),
                       preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)           # (..., Q, N)
    d2 = q2 - 2.0 * cross + jnp.swapaxes(s2, -1, -2)
    return jnp.maximum(d2, 0.0)


def _knn_single(query: jnp.ndarray, support: jnp.ndarray, k: int,
                chunk_size: int):
    """kNN for one cloud: query (Q, C), support (N, C) -> (Q, k) d2 + idx."""
    Q, _ = query.shape
    N = support.shape[0]

    if N <= chunk_size:
        d2 = pairwise_dist2(query, support)
        neg_d, idx = lax.top_k(-d2, k)
        return -neg_d, idx

    num_chunks = -(-N // chunk_size)
    pad = num_chunks * chunk_size - N
    support_p = jnp.pad(support, ((0, pad), (0, 0)))
    chunk_iota = lax.broadcasted_iota(jnp.int32, (1, chunk_size), 1)

    def body(c, carry):
        best_d, best_i = carry
        sup = lax.dynamic_slice(support_p, (c * chunk_size, 0),
                                (chunk_size, support.shape[1]))
        d2 = pairwise_dist2(query, sup)                      # (Q, chunk)
        idx = c * chunk_size + chunk_iota                    # (1, chunk)
        d2 = jnp.where(idx < N, d2, jnp.inf)
        all_d = jnp.concatenate([best_d, d2], axis=1)
        all_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, d2.shape)], axis=1)
        neg_d, sel = lax.top_k(-all_d, k)
        best_i = jnp.take_along_axis(all_i, sel, axis=1)
        return -neg_d, best_i

    init = (jnp.full((Q, k), jnp.inf, dtype=jnp.float32),
            jnp.zeros((Q, k), dtype=jnp.int32))
    best_d, best_i = lax.fori_loop(0, num_chunks, body, init)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "squared"))
def knn(query: jnp.ndarray, support: jnp.ndarray, k: int,
        chunk_size: int = 2048, squared: bool = False):
    """Batched kNN.

    Args:
        query: (B, Q, C) points to find neighbours for.
        support: (B, N, C) points to search in.
        k: number of neighbours.
        chunk_size: support-axis streaming chunk.
        squared: if True return squared distances (cheaper; the reference's
            CUDA heap kNN returns squared distances, ``knn_point`` returns
            euclidean).

    Returns:
        (dist, idx): (B, Q, k) ascending distances and int32 indices.
    """
    f = functools.partial(_knn_single, k=k, chunk_size=chunk_size)
    d2, idx = jax.vmap(f)(query.astype(jnp.float32), support.astype(jnp.float32))
    if not squared:
        d2 = jnp.sqrt(d2)
    return d2, idx


def knn_point(k: int, query: jnp.ndarray, support: jnp.ndarray | None = None,
              chunk_size: int = 2048):
    """Signature-compatible port of ``knn_point``
    (reference ``openpoints/models/layers/knn.py:7``): returns euclidean
    distances + indices, ascending, self included when support is query."""
    if support is None:
        support = query
    return knn(query, support, k, chunk_size=chunk_size, squared=False)
