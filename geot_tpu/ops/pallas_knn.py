"""Pallas fused kNN for small k (k <= 4).

Covers the decoder's hot searches — three_nn (k=3) and the DGCNN edge graphs
(k=4) — by fusing the pairwise-distance computation with the selection so the
(Q, N) distance block never leaves VMEM.  The ``approx_min_k`` path (general
k) streams d2 blocks through HBM; for k<=4 an exact min-extraction in VMEM is
both exact and faster.

Layout per grid program = one (cloud, query tile):
- query tile (TQ, 3) and the full support (3, N) resident in VMEM;
- loop over support chunks (CS lanes): d2 (TQ, CS) via 3 broadcast FMAs;
- per chunk: extract the chunk's top-k by k rounds of (min + argmin + mask);
- merge 2k candidate columns into the running best-k with a small
  odd-even network on (TQ, 1) vectors.

Exact (no recall target), ties to the smaller index like ``lax.top_k``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _knn_kernel(q_ref, s_ref, dist_ref, idx_ref, *, k, n_valid, cs, tq_valid):
    # q_ref: (1, TQ, 128) queries (x,y,z in lanes 0..2); s_ref: (1, 3, Np)
    # dist_ref/idx_ref: (1, TQ, LANE) with first k lanes used
    TQ = q_ref.shape[1]
    Np = s_ref.shape[2]
    num_chunks = Np // cs

    qx = q_ref[0, :, 0:1]                        # (TQ, 1)
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    lane = lax.broadcasted_iota(jnp.int32, (TQ, LANE), 1)

    # running best-k as 2k separate (TQ, 1) columns (tuple carry — Mosaic
    # cannot lower value dynamic_update_slice)
    init = tuple(jnp.full((TQ, 1), jnp.inf, jnp.float32) for _ in range(2 * k)) \
        + tuple(jnp.full((TQ, 1), Np, jnp.int32) for _ in range(2 * k))

    def body(c, carry):
        cols_d = list(carry[: 2 * k])
        cols_i = list(carry[2 * k:])
        sx = s_ref[0, 0:1, pl.ds(c * cs, cs)]    # (1, CS)
        sy = s_ref[0, 1:2, pl.ds(c * cs, cs)]
        sz = s_ref[0, 2:3, pl.ds(c * cs, cs)]
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2   # (TQ, CS)
        cidx = c * cs + lax.broadcasted_iota(jnp.int32, (TQ, cs), 1)
        d2 = jnp.where(cidx < n_valid, d2, jnp.inf)

        # extract the chunk's k smallest into the scratch columns
        for j in range(k):
            m = jnp.min(d2, axis=1, keepdims=True)               # (TQ, 1)
            am = jnp.min(jnp.where(d2 == m, cidx, Np), axis=1,
                         keepdims=True).astype(jnp.int32)
            cols_d[k + j] = m
            cols_i[k + j] = am
            d2 = jnp.where(cidx == am, jnp.inf, d2)

        # odd-even transposition sort across the 2k columns
        def cswp(a, b):
            da, db = cols_d[a], cols_d[b]
            ia, ib = cols_i[a], cols_i[b]
            swap = (db < da) | ((db == da) & (ib < ia))
            cols_d[a] = jnp.where(swap, db, da)
            cols_d[b] = jnp.where(swap, da, db)
            cols_i[a] = jnp.where(swap, ib, ia)
            cols_i[b] = jnp.where(swap, ia, ib)

        # both halves are sorted, so odd-even transposition converges in
        # k+1 passes (max displacement k) instead of 2k
        n2 = 2 * k
        for _ in range(k + 1):
            for a in range(0, n2 - 1, 2):
                cswp(a, a + 1)
            for a in range(1, n2 - 1, 2):
                cswp(a, a + 1)
        return tuple(cols_d) + tuple(cols_i)

    out = lax.fori_loop(0, num_chunks, body, init)
    best_d = jnp.concatenate(out[: 2 * k], axis=1)
    best_i = jnp.concatenate(out[2 * k: 4 * k], axis=1)
    pad_d = jnp.zeros((TQ, LANE - 2 * k), jnp.float32)
    pad_i = jnp.zeros((TQ, LANE - 2 * k), jnp.int32)
    dist_ref[0] = jnp.concatenate([best_d, pad_d], axis=1)
    idx_ref[0] = jnp.concatenate([best_i, pad_i], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tq", "cs", "interpret"))
def knn_small_k_pallas(query: jnp.ndarray, support: jnp.ndarray, k: int,
                       tq: int = 256, cs: int = 2048,
                       interpret: bool = False):
    """Batched exact kNN for k <= 4: (B, Q, 3) x (B, N, 3) ->
    (d2 (B, Q, k) SQUARED, idx (B, Q, k))."""
    assert k <= 4, "small-k kernel; use ops.knn for larger k"
    B, Q, _ = query.shape
    N = support.shape[1]
    Qp = -(-Q // tq) * tq
    Np = -(-N // cs) * cs

    q = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, Qp - Q), (0, 0)))
    q = jnp.pad(q, ((0, 0), (0, 0), (0, LANE - 3)))          # (B, Qp, 128)
    s = jnp.swapaxes(support.astype(jnp.float32), 1, 2)       # (B, 3, N)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, Np - N)))

    grid = (B, Qp // tq)
    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_valid=N, cs=cs, tq_valid=Q),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tq, LANE), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, Np), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, tq, LANE), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tq, LANE), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, Qp, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((B, Qp, LANE), jnp.int32)),
        interpret=interpret,
    )(q, s)
    return dist[:, :Q, :k], idx[:, :Q, :k]
