"""Pallas farthest-point-sampling kernel.

The pure-JAX FPS (``ops.fps``) runs its sequential selection loop through an
XLA while-loop whose per-iteration cost is dominated by dispatch/HBM traffic
(~40 us/iter measured, 306 ms for 16k->8192 at B=8).  This kernel keeps the
whole state in VMEM and lays it out as (8, N/8) so every elementwise pass uses
all 8 VPU sublanes (a (1, N) row would run at 1/8 utilisation).  One grid
program per cloud.

Mosaic cannot store scalars to VMEM, so selected indices are packed into
(rows, 128)-lane vectors and written with a masked row read-modify-write.

Semantics identical to ``ops.fps`` / the reference CUDA kernel
(``pointops/src/sampling/sampling_cuda_kernel.cu:15``): idx[0] = 0, then
iteratively the argmax of the running min-distance; ties resolve to the
smallest index; padded slots can never win (min-dist pinned to -1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
CHUNK = SUB * LANE  # 1024: point-count granularity of the 2-D layout


def _fps_kernel(xyz_ref, lut_ref, out_ref, mind_ref, *, npoint, n_valid, g):
    # xyz_ref: (G, 3, SUB, C) f32 — per cloud, x/y/z each laid out (SUB, C),
    #          flat index = sub * C + c; lut_ref: (G, C, LANE) with
    #          lut[g, c, 3*sub + d] = coord d of point (sub, c) — one
    #          dynamic-sublane row read replaces three full-array masked
    #          reductions for coordinate extraction; out_ref: (G, R, LANE)
    #          i32; mind_ref: (G*SUB, C) f32.
    #
    # G clouds are interleaved in ONE program: their selection chains are
    # independent, so each cloud's ~0.5 us argmax-reduce latency hides behind
    # the other clouds' work (measured: 4 interleaved dependent-reduce chains
    # run at 210 ns/chain-step vs 761 ns solo — Mosaic pipelines them).
    # Results are bit-identical to the G=1 kernel per cloud.
    C = xyz_ref.shape[3]
    iota = (lax.broadcasted_iota(jnp.int32, (SUB, C), 0) * C +
            lax.broadcasted_iota(jnp.int32, (SUB, C), 1))
    lane = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    valid = iota < n_valid
    for k in range(g):
        mind_ref[k * SUB:(k + 1) * SUB, :] = jnp.where(valid, 1e10, -1.0)
        out_ref[k] = jnp.zeros_like(out_ref[k])     # idx[0] = 0 included

    NP = SUB * C

    def body(j, last):
        orow = j // LANE
        col = j % LANE
        new_last = []
        for k in range(g):
            lk = last[k]
            sub = lk // C
            c = lk % C
            row = lut_ref[k, pl.ds(c, 1), :]         # (1, LANE)
            lx = jnp.sum(jnp.where(lane == 3 * sub + 0, row, 0.0))
            ly = jnp.sum(jnp.where(lane == 3 * sub + 1, row, 0.0))
            lz = jnp.sum(jnp.where(lane == 3 * sub + 2, row, 0.0))
            x = xyz_ref[k, 0]
            y = xyz_ref[k, 1]
            z = xyz_ref[k, 2]
            d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            # no `where(valid, ...)` needed: padded slots start at -1 and
            # d2 >= 0, so min() pins them at -1 forever (one select saved
            # per step over the full array)
            m = jnp.minimum(mind_ref[k * SUB:(k + 1) * SUB, :], d2)
            mind_ref[k * SUB:(k + 1) * SUB, :] = m
            mx = jnp.max(m)
            best = jnp.min(jnp.where(m == mx, iota, NP)).astype(jnp.int32)
            cur = out_ref[k, pl.ds(orow, 1), :]      # (1, LANE)
            out_ref[k, pl.ds(orow, 1), :] = jnp.where(lane == col, best, cur)
            new_last.append(best)
        return tuple(new_last)

    lax.fori_loop(1, npoint, body, tuple(jnp.int32(0) for _ in range(g)))


SENT = 1 << 30  # padded-slot sentinel original index (sorts above any real id)


def _fps_bucket_kernel(xyz_ref, oidx_ref, box_ref, out_ref,
                       mind_ref, bmax_ref, bargi_ref, *, npoint, nb):
    """Bucket-pruned exact FPS (QuickFPS redesigned for vreg granularity).

    Points are Morton-sorted; bucket b = one (8, 128) vreg = 1024 points with
    a tight bounding box.  Per selection step the (1, LANE) box-distance row
    is compared against the per-bucket running max of min-distances: a bucket
    whose box is farther than its max CANNOT change (min(mind, d2) = mind for
    every point), so its distance update is skipped exactly.  The skip mask is
    packed into one int32 bitmask scalar (one lane-weighted sum) so each
    bucket costs ~3 scalar ops when skipped.

    State rows (VMEM): bmax (1, LANE) per-bucket max of mind; bargi (1, LANE)
    the smallest ORIGINAL index attaining that max (tie key).  Global argmax =
    lexicographic (max desc, orig idx asc) over the rows — reference tie
    semantics (``sampling_cuda_kernel.cu:15``: ties to the smallest index)
    survive the sort because ties are broken on original ids, not positions.
    """
    lane = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    oidx_all = oidx_ref[0]
    mind_ref[:] = jnp.where(oidx_all < SENT, 1e10, -1.0)
    bmax_ref[:] = jnp.where(lane < nb, 1e30, -2.0)   # force round-1 update
    bargi_ref[:] = jnp.full((1, LANE), SENT, jnp.int32)
    out_ref[0] = jnp.zeros_like(out_ref[0])          # idx[0] = 0 included

    # step-0 winner is original index 0: one-time global masked extraction
    w0 = oidx_all == 0
    px0 = jnp.sum(jnp.where(w0, xyz_ref[0, 0], 0.0))
    py0 = jnp.sum(jnp.where(w0, xyz_ref[0, 1], 0.0))
    pz0 = jnp.sum(jnp.where(w0, xyz_ref[0, 2], 0.0))

    xmin = box_ref[0, 0:1, :]
    ymin = box_ref[0, 1:2, :]
    zmin = box_ref[0, 2:3, :]
    xmax = box_ref[0, 3:4, :]
    ymax = box_ref[0, 4:5, :]
    zmax = box_ref[0, 5:6, :]
    bitw = jnp.where(lane < nb,
                     lax.shift_left(1, jnp.minimum(lane, 30)), 0)

    def body(j, carry):
        px, py, pz = carry
        dx = jnp.maximum(jnp.maximum(xmin - px, px - xmax), 0.0)
        dy = jnp.maximum(jnp.maximum(ymin - py, py - ymax), 0.0)
        dz = jnp.maximum(jnp.maximum(zmin - pz, pz - zmax), 0.0)
        d2box = dx * dx + dy * dy + dz * dz                     # (1, LANE)
        # 1e-5 slack >> f32 rounding of the two distance computations, so a
        # skipped bucket provably cannot change; borderline buckets just
        # update unnecessarily (identical results either way)
        need = d2box * 0.99999 < bmax_ref[:]
        bits = jnp.sum(jnp.where(need, bitw, 0))

        for b in range(nb):
            @pl.when((lax.shift_right_logical(bits, b) & 1) == 1)
            def _(b=b):
                r0 = 8 * b
                x = xyz_ref[0, 0, r0:r0 + 8, :]
                y = xyz_ref[0, 1, r0:r0 + 8, :]
                z = xyz_ref[0, 2, r0:r0 + 8, :]
                d2 = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
                m = jnp.minimum(mind_ref[r0:r0 + 8, :], d2)
                mind_ref[r0:r0 + 8, :] = m
                bm = jnp.max(m)
                oi = oidx_ref[0, r0:r0 + 8, :]
                bai = jnp.min(jnp.where(m == bm, oi, SENT))
                bmax_ref[:] = jnp.where(lane == b, bm, bmax_ref[:])
                bargi_ref[:] = jnp.where(lane == b, bai, bargi_ref[:])

        bmax = bmax_ref[:]
        bargi = bargi_ref[:]
        mx = jnp.max(bmax)
        cand = jnp.where(bmax == mx, bargi, SENT)
        best = jnp.min(cand)
        jb = jnp.min(jnp.where((bmax == mx) & (bargi == best), lane, LANE))
        r0 = pl.multiple_of(jb * 8, 8)
        wi = oidx_ref[0, pl.ds(r0, 8), :] == best
        nx = jnp.sum(jnp.where(wi, xyz_ref[0, 0, pl.ds(r0, 8), :], 0.0))
        ny = jnp.sum(jnp.where(wi, xyz_ref[0, 1, pl.ds(r0, 8), :], 0.0))
        nz = jnp.sum(jnp.where(wi, xyz_ref[0, 2, pl.ds(r0, 8), :], 0.0))

        orow = j // LANE
        col = j % LANE
        cur = out_ref[0, pl.ds(orow, 1), :]
        out_ref[0, pl.ds(orow, 1), :] = jnp.where(lane == col, best, cur)
        return nx, ny, nz

    lax.fori_loop(1, npoint, body, (px0, py0, pz0))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_bucket_pallas(xyz: jnp.ndarray, npoint: int,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 ORIGINAL indices; bit-identical to
    ``fps_pallas``/``ops.fps`` but with Morton-bucket pruning (needs
    ceil(N/1024) <= 30 buckets for the int32 skip bitmask)."""
    from .morton import spatial_sort

    B, N, _ = xyz.shape
    nb = -(-N // CHUNK)
    assert nb <= 30, "bitmask pruning supports up to 30 buckets (30k points)"
    Np = nb * CHUNK
    R = -(-npoint // LANE)

    sx, order = spatial_sort(xyz.astype(jnp.float32))
    sxp = jnp.pad(sx, ((0, 0), (0, Np - N), (0, 0)), constant_values=1e9)
    oidx = jnp.pad(order, ((0, 0), (0, Np - N)), constant_values=SENT)

    pts_b = sxp.reshape(B, nb, CHUNK, 3)
    validb = (oidx < SENT).reshape(B, nb, CHUNK, 1)
    bmin = jnp.min(jnp.where(validb, pts_b, 4e9), axis=2)       # (B, nb, 3)
    bmax = jnp.max(jnp.where(validb, pts_b, -4e9), axis=2)
    boxes = jnp.concatenate([bmin, bmax], axis=-1)              # (B, nb, 6)
    boxr = jnp.transpose(boxes, (0, 2, 1))                      # (B, 6, nb)
    boxr = jnp.pad(boxr, ((0, 0), (0, 2), (0, LANE - nb)),
                   constant_values=1e9)

    xyz_t = jnp.swapaxes(sxp, 1, 2).reshape(B, 3, nb * SUB, LANE)
    oidx_r = oidx.reshape(B, nb * SUB, LANE)

    out = pl.pallas_call(
        functools.partial(_fps_bucket_kernel, npoint=npoint, nb=nb),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, nb * SUB, LANE), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nb * SUB, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, SUB, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nb * SUB, LANE), jnp.float32),
                        pltpu.VMEM((1, LANE), jnp.float32),
                        pltpu.VMEM((1, LANE), jnp.int32)],
        interpret=interpret,
    )(xyz_t, oidx_r, boxr)
    return out.reshape(B, R * LANE)[:, :npoint]


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 indices, Pallas TPU kernel.

    Clouds are processed G at a time per grid program with their selection
    chains interleaved (see ``_fps_kernel``); G is capped by VMEM (~1.3 MB
    per cloud at 16k points).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    B, N, _ = xyz.shape
    Np = -(-N // CHUNK) * CHUNK
    C = Np // SUB
    R = -(-npoint // LANE)
    # ~80 bytes/point of VMEM per cloud (xyz + lut + mind + out); cap the
    # interleave width so G clouds stay within ~12 MB of the ~16 MB VMEM
    cap = max(1, min(B, 4, (12 << 20) // (80 * Np)))
    # Padding clouds run FULL dummy selection chains, so divisibility can
    # beat maximal interleave (B=6: G=3 runs 6 chains, G=4 runs 8).  Pick G
    # minimising ceil(B/G)*G*t(G) with the measured per-cloud chain cost at
    # 16k t(1)=4.06 ms .. t(4)=3.31 ms (linear in G); ties prefer larger G.
    G = min(range(1, cap + 1),
            key=lambda g: ((-(-B // g) * g) * (4.06 - 0.25 * (g - 1)), -g))
    Bp = -(-B // G) * G
    xyz32 = xyz.astype(jnp.float32)
    if Bp > B:                                   # pad with dummy clouds
        xyz32 = jnp.concatenate(
            [xyz32, jnp.zeros((Bp - B, N, 3), jnp.float32)], axis=0)
    xyz_t = jnp.swapaxes(xyz32, 1, 2)                        # (Bp, 3, N)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, Np - N)))
    xyz_t = xyz_t.reshape(Bp, 3, SUB, C)
    # coordinate lookup table: lut[b, c, 3*sub + d] = xyz_t[b, d, sub, c]
    lut = xyz_t.transpose(0, 3, 2, 1).reshape(Bp, C, SUB * 3)  # (Bp, C, 24)
    lut = jnp.pad(lut, ((0, 0), (0, 0), (0, LANE - SUB * 3)))

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n_valid=N, g=G),
        grid=(Bp // G,),
        in_specs=[pl.BlockSpec((G, 3, SUB, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, C, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, R, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, R, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G * SUB, C), jnp.float32)],
        interpret=interpret,
    )(xyz_t, lut)
    return out.reshape(Bp, R * LANE)[:B, :npoint]
