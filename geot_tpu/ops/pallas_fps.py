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


def _fps_kernel(xyz_ref, lut_ref, out_ref, mind_ref, *, npoint, n_valid):
    # xyz_ref: (1, 3, SUB, C) f32 — x/y/z each laid out (SUB, C), flat index
    #          = sub * C + c; lut_ref: (1, C, LANE) with lut[c, 3*sub + d] =
    #          coord d of point (sub, c) — one dynamic-sublane row read
    #          replaces three full-array masked reductions for coordinate
    #          extraction; out_ref: (1, R, LANE) i32; mind_ref: (SUB, C) f32
    C = xyz_ref.shape[3]
    iota = (lax.broadcasted_iota(jnp.int32, (SUB, C), 0) * C +
            lax.broadcasted_iota(jnp.int32, (SUB, C), 1))
    lane = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    valid = iota < n_valid
    mind_ref[:] = jnp.where(valid, 1e10, -1.0)
    out_ref[0] = jnp.zeros_like(out_ref[0])          # idx[0] = 0 included

    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]
    NP = SUB * C

    def body(j, last):
        sub = last // C
        c = last % C
        row = lut_ref[0, pl.ds(c, 1), :]             # (1, LANE)
        lx = jnp.sum(jnp.where(lane == 3 * sub + 0, row, 0.0))
        ly = jnp.sum(jnp.where(lane == 3 * sub + 1, row, 0.0))
        lz = jnp.sum(jnp.where(lane == 3 * sub + 2, row, 0.0))
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        m = jnp.minimum(mind_ref[:], jnp.where(valid, d2, -1.0))
        mind_ref[:] = m
        mx = jnp.max(m)
        best = jnp.min(jnp.where(m == mx, iota, NP)).astype(jnp.int32)
        orow = j // LANE
        col = j % LANE
        cur = out_ref[0, pl.ds(orow, 1), :]          # (1, LANE)
        out_ref[0, pl.ds(orow, 1), :] = jnp.where(lane == col, best, cur)
        return best

    lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 indices, Pallas TPU kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    B, N, _ = xyz.shape
    Np = -(-N // CHUNK) * CHUNK
    C = Np // SUB
    R = -(-npoint // LANE)
    xyz32 = xyz.astype(jnp.float32)
    xyz_t = jnp.swapaxes(xyz32, 1, 2)                        # (B, 3, N)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, Np - N)))
    xyz_t = xyz_t.reshape(B, 3, SUB, C)
    # coordinate lookup table: lut[b, c, 3*sub + d] = xyz_t[b, d, sub, c]
    lut = xyz_t.transpose(0, 3, 2, 1).reshape(B, C, SUB * 3)  # (B, C, 24)
    lut = jnp.pad(lut, ((0, 0), (0, 0), (0, LANE - SUB * 3)))

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n_valid=N),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, SUB, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUB, C), jnp.float32)],
        interpret=interpret,
    )(xyz_t, lut)
    return out.reshape(B, R * LANE)[:, :npoint]
