"""Farthest point sampling.

Replaces the reference CUDA kernels
``furthestsampling_cuda`` (``pointops/src/sampling/sampling_cuda_kernel.cu:15``),
``furthestsampling_weights_cuda`` (``:175``) and
``furthest_point_sampling`` (``pointnet2/_ext_src/src/sampling_gpu.cu``).

Semantics preserved exactly: the first selected index is 0, then iteratively
pick the point whose min-distance to the selected set is largest; the
weighted variant multiplies each candidate's squared distance by
``max(weight, 1e-12)`` before the running min (reference ``:222``).

TPU mapping: the selection loop is inherently sequential, but each iteration
is a fully vectorised (B, N) distance update + argmax — pure VPU work over
arrays that stay resident on-chip.  A ``lax.fori_loop`` writing into a
pre-allocated (B, npoint) index buffer keeps shapes static for XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Batched FPS indices.

    On TPU this dispatches to the Pallas kernel (state stays in VMEM, ~20x
    faster than the XLA while-loop); elsewhere the pure-JAX loop below.

    Args:
        xyz: (B, N, 3) float coordinates.
        npoint: number of samples (static).
    Returns:
        (B, npoint) int32 indices; idx[:, 0] == 0 (reference convention).
    """
    if _on_tpu():
        from .pallas_fps import fps_pallas

        return fps_pallas(xyz, npoint)
    return _fps_impl(xyz.astype(jnp.float32), None, npoint)


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_weighted(xyz: jnp.ndarray, weights: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Weighted FPS (reference ``pointops.fps_weight``): candidate score is
    ``min over selected(d2 * max(w, 1e-12))``.

    Always the XLA loop — no weighted Pallas kernel exists (the op is
    reference-surface parity, not on any hot path; GeoT's configs never
    call it).  A TPU hot-path user should extend ``pallas_fps`` first."""
    return _fps_impl(xyz.astype(jnp.float32), weights.astype(jnp.float32), npoint)


def _fps_impl(xyz, weights, npoint):
    B, N, _ = xyz.shape

    def body(j, carry):
        min_d2, idx, last = carry
        # distance from every point to the most recently selected point
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum((xyz - last_xyz) ** 2, axis=-1)                       # (B,N)
        if weights is not None:
            d2 = d2 * jnp.maximum(weights, 1e-12)
        min_d2 = jnp.minimum(min_d2, d2)
        best = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)               # (B,)
        idx = idx.at[:, j].set(best)
        return min_d2, idx, best

    init_idx = jnp.zeros((B, npoint), dtype=jnp.int32)
    init_min = jnp.full((B, N), 1e10, dtype=jnp.float32)
    last0 = jnp.zeros((B,), dtype=jnp.int32)  # idx[:,0] = 0
    _, idx, _ = lax.fori_loop(1, npoint, body, (init_min, init_idx, last0))
    return idx


def fps_gather(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """FPS returning the sampled coordinates, like the reference convenience
    wrappers ``pointops.fps`` (``pointops/functions/pointops.py:24``) and
    ``fps`` in the backbone (``openpoints/models/backbone/transformer.py:266``)."""
    idx = fps(xyz, npoint)
    return jnp.take_along_axis(xyz, idx[..., None], axis=1)


def _bitrev_schedule(n: int) -> "np.ndarray":
    """Static bit-reversed visit order of 0..n-1 (van der Corput): every
    prefix of the returned sequence is evenly spread over [0, n)."""
    import numpy as np

    bits = max(1, (n - 1).bit_length())
    idx = np.arange(1 << bits)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev[rev < n]


def fps_stratified(xyz: jnp.ndarray, npoint: int, fps_prefix: int,
                   perm_seed: int = 0, fill: str = "morton") -> jnp.ndarray:
    """Stratified pyramid sampling: TRUE farthest-point selection for the
    first ``fps_prefix`` indices, then fill to ``npoint`` from the
    not-yet-selected points (exact complement — the result is
    sample-without-replacement like a full FPS run, and every prefix of the
    first ``fps_prefix`` rows is a true FPS prefix).

    ``fill="morton"`` (default) visits the complement along the cloud's
    Morton curve in BIT-REVERSED order: prefixes of the fill are hierarchical
    octree strata, i.e. near-uniform spatial coverage at every length — the
    property that makes the fine pyramid levels quality-neutral
    (``log/fast_pyramid_eval.json``; a plain pseudo-random permutation fill
    costs ~0.25 val mIoU because the FINEST level's worst-case coverage gap
    drives the final 3-NN upsample).  ``fill="perm"`` keeps that cheaper but
    weaker variant."""
    import numpy as np

    B, N, _ = xyz.shape
    fps_prefix = min(fps_prefix, npoint)
    head = fps(xyz, fps_prefix)                                   # (B, L)
    if fps_prefix == npoint:
        return head
    if fill == "morton":
        from .morton import morton_codes

        curve = jnp.argsort(morton_codes(xyz), axis=-1)           # (B, N)
        seq = jnp.asarray(_bitrev_schedule(N))
        cand = jnp.take_along_axis(curve, seq[None, :].repeat(B, 0), axis=1)
    else:
        perm = jnp.asarray(np.random.default_rng(perm_seed).permutation(N))
        cand = jnp.broadcast_to(perm[None, :], (B, N))
    rows = jnp.arange(B)[:, None]
    taken = jnp.zeros((B, N), bool).at[rows, head].set(True)
    untaken = ~jnp.take_along_axis(taken, cand, axis=1)
    # A degenerate cloud (fewer distinct points than fps_prefix — e.g. a
    # small scan upsampled with replacement) makes FPS repeat indices once
    # min-distances hit zero.  Keep only each head index's FIRST occurrence
    # so the combined sequence stays duplicate-free: the result is a true
    # permutation when npoint == N (the model's inverse scatter requires
    # one), and in the common all-distinct case `occ` is all-True and the
    # behaviour is byte-identical to head-then-fill.
    jot = jnp.broadcast_to(jnp.arange(head.shape[1], dtype=jnp.int32),
                           head.shape)
    first = jnp.full((B, N), head.shape[1], jnp.int32).at[
        rows, head].min(jot)
    occ = jnp.take_along_axis(first, head, axis=1) == jot
    # stable partition over [head | candidates] (kept entries first, order
    # preserved): target slots via two cumsums + one scatter — equivalent to
    # a stable argsort on the boolean key but without the sorting network.
    # Kept = distinct head (k) + untaken candidates (N - k) = exactly N, so
    # `pos` is a bijection onto [0, L + N) and the scatter cannot collide.
    seqv = jnp.concatenate([head.astype(cand.dtype), cand], axis=1)
    keep = jnp.concatenate([occ, untaken], axis=1)
    pos = jnp.where(keep,
                    jnp.cumsum(keep, axis=1) - 1,
                    N + jnp.cumsum(~keep, axis=1) - 1)
    part = jnp.zeros((B, seqv.shape[1]), cand.dtype).at[
        rows, pos].set(seqv, unique_indices=True)
    return part[:, :npoint]
