"""Bucket-pruned exact small-k kNN (k <= 4) for large supports.

Same contract as ``pallas_knn.knn_small_k_pallas`` (bit-exact distances and
reference tie semantics — ties to the smallest ORIGINAL index, matching
``lax.top_k`` and the CUDA heap kNN ``knnquery_cuda_kernel.cu:21``), but both
sides are Morton-sorted so support chunks have tight bounding boxes and a
conservative box-to-box bound skips whole chunks exactly:

- architecture = the base kernel's (one grid program per (cloud, query tile),
  full support resident in VMEM, ``fori_loop`` over chunks) — a scalar-
  prefetch grid with one step per chunk was tried and rejected: the dynamic
  ``index_map`` defeats DMA pipelining (~8 us per skipped step, 4.7 ms floor
  at 16k x 8k where this kernel runs in ~1 ms total);
- chunk VISIT ORDER is precomputed outside (argsort of tile-box<->chunk-box
  distances, read from SMEM) so near chunks are processed first and the
  running worst-of-best-k bound tightens immediately;
- skip rule: chunk c is skipped iff box_d2 * (1 - 1e-5) > worst, where worst
  = max over the tile of each query's current k-th best.  For any support s
  in the chunk and query q in the tile, computed d2(q, s) >= box_d2 *
  (1 - eps) > worst >= q's k-th best, so s cannot enter any top-k; exact ties
  at the k-th boundary survive because the rule is strict-with-margin;
- running best-k columns live in VMEM scratch (read-modify-written under
  ``pl.when``), merged per chunk with the base kernel's odd-even network.

Padded queries replicate the tile's last valid query (keeps `worst` real);
padded support gets huge coords + sentinel ids (never selected).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SENT = 1 << 30
INF = 3e38  # python float: jnp constants would be captured by the kernel


def _kernel(q_ref, s_ref, oidx_ref, order_ref, d2cb_ref, dist_ref, idx_ref,
            bd_ref, bi_ref, worst_ref, *, k, tq, cs, nc):
    t = pl.program_id(1)
    bd_ref[:] = jnp.full((tq, LANE), INF, jnp.float32)
    bi_ref[:] = jnp.full((tq, LANE), SENT, jnp.int32)
    worst_ref[0, 0] = INF

    qx = q_ref[0, 0, :, 0:1]                           # (TQ, 1)
    qy = q_ref[0, 0, :, 1:2]
    qz = q_ref[0, 0, :, 2:3]

    def body(ci, _):
        @pl.when(d2cb_ref[0, t, ci] * 0.99999 <= worst_ref[0, 0])
        def _():
            cid = order_ref[0, t, ci]
            off = pl.multiple_of(cid * cs, cs)
            sx = s_ref[0, 0:1, pl.ds(off, cs)]         # (1, CS)
            sy = s_ref[0, 1:2, pl.ds(off, cs)]
            sz = s_ref[0, 2:3, pl.ds(off, cs)]
            d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2
            cidx = jnp.broadcast_to(oidx_ref[0, 0:1, pl.ds(off, cs)],
                                    (tq, cs))

            cols_d = [bd_ref[:, j:j + 1] for j in range(k)]
            cols_i = [bi_ref[:, j:j + 1] for j in range(k)]
            for _j in range(k):
                m = jnp.min(d2, axis=1, keepdims=True)
                am = jnp.min(jnp.where(d2 == m, cidx, SENT), axis=1,
                             keepdims=True).astype(jnp.int32)
                cols_d.append(m)
                cols_i.append(am)
                d2 = jnp.where(cidx == am, INF, d2)

            def cswp(a, b):
                da, db = cols_d[a], cols_d[b]
                ia, ib = cols_i[a], cols_i[b]
                swap = (db < da) | ((db == da) & (ib < ia))
                cols_d[a] = jnp.where(swap, db, da)
                cols_d[b] = jnp.where(swap, da, db)
                cols_i[a] = jnp.where(swap, ib, ia)
                cols_i[b] = jnp.where(swap, ia, ib)

            n2 = 2 * k
            for _ in range(k + 1):  # both halves sorted -> k+1 passes suffice
                for a in range(0, n2 - 1, 2):
                    cswp(a, a + 1)
                for a in range(1, n2 - 1, 2):
                    cswp(a, a + 1)
            for j in range(k):
                bd_ref[:, j:j + 1] = cols_d[j]
                bi_ref[:, j:j + 1] = cols_i[j]
            worst_ref[0, 0] = jnp.max(cols_d[k - 1])
        return 0

    lax.fori_loop(0, nc, body, 0)
    dist_ref[0, 0] = bd_ref[:]
    idx_ref[0, 0] = bi_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "cs", "interpret"))
def knn_small_k_pruned(query: jnp.ndarray, support: jnp.ndarray, k: int,
                       tq: int = 256, cs: int = 1024,
                       interpret: bool = False):
    """Batched exact kNN for k <= 4 with Morton-bucket pruning:
    (B, Q, 3) x (B, N, 3) -> (d2 (B, Q, k) SQUARED, idx (B, Q, k))."""
    from .morton import spatial_sort

    assert k <= 4
    B, Q, _ = query.shape
    N = support.shape[1]
    NT = -(-Q // tq)
    Qp = NT * tq
    NC = -(-N // cs)
    Np = NC * cs

    sq, qord = spatial_sort(query.astype(jnp.float32))
    ss, sord = spatial_sort(support.astype(jnp.float32))

    # pad queries by replicating the last (sorted) query: keeps the tile's
    # worst-of-best-k bound real instead of pinned at +inf
    if Qp > Q:
        sq = jnp.concatenate(
            [sq, jnp.broadcast_to(sq[:, -1:], (B, Qp - Q, 3))], axis=1)
    q_tiles = sq.reshape(B, NT, tq, 3)
    q_arr = jnp.zeros((B, NT, tq, LANE), jnp.float32)
    q_arr = q_arr.at[..., 0:3].set(q_tiles)

    ssp = jnp.pad(ss, ((0, 0), (0, Np - N), (0, 0)), constant_values=1e9)
    oidx = jnp.pad(sord, ((0, 0), (0, Np - N)), constant_values=SENT)
    s_arr = jnp.swapaxes(ssp, 1, 2)                     # (B, 3, Np)
    oidx_arr = oidx[:, None, :]                         # (B, 1, Np)

    tmin = jnp.min(q_tiles, axis=2)                     # (B, NT, 3)
    tmax = jnp.max(q_tiles, axis=2)
    sb = ssp.reshape(B, NC, cs, 3)
    validb = (oidx < SENT).reshape(B, NC, cs, 1)
    cmin = jnp.min(jnp.where(validb, sb, 4e9), axis=2)  # (B, NC, 3)
    cmax = jnp.max(jnp.where(validb, sb, -4e9), axis=2)
    gap = jnp.maximum(jnp.maximum(cmin[:, None] - tmax[:, :, None],
                                  tmin[:, :, None] - cmax[:, None]), 0.0)
    d2cb = jnp.sum(gap * gap, axis=-1)                  # (B, NT, NC)
    order = jnp.argsort(d2cb, axis=-1).astype(jnp.int32)
    d2cb_s = jnp.take_along_axis(d2cb, order, axis=-1)

    dist, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, tq=tq, cs=cs, nc=NC),
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, 1, tq, LANE), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, NC), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NT, NC), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tq, LANE), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, LANE), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, NT, tq, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((B, NT, tq, LANE), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((tq, LANE), jnp.float32),
                        pltpu.VMEM((tq, LANE), jnp.int32),
                        pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(q_arr, s_arr, oidx_arr, order, d2cb_s)

    d2 = dist[..., :k].reshape(B, Qp, k)[:, :Q]
    ix = idx[..., :k].reshape(B, Qp, k)[:, :Q]
    # scatter rows back to the original query order
    inv = jnp.zeros((B, Q), jnp.int32)
    inv = jax.vmap(lambda i, o: i.at[o].set(jnp.arange(Q, dtype=jnp.int32)))(
        inv, qord)
    d2 = jnp.take_along_axis(d2, inv[..., None], axis=1)
    ix = jnp.take_along_axis(ix, inv[..., None], axis=1)
    return d2, ix
