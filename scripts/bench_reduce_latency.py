"""Measure Mosaic dependent-reduce-chain latency vs array size.

Decides the fate of a frontier-pool/lazy-update FPS redesign: the exact-FPS
kernel's ~495 ns/step is hypothesised to be ~3 chained cross-lane reduce
latencies (max -> tie-argmin -> coord-extract), independent of array size.
A pool-based FPS replaces full-array reduces with (1, 128)-row reduces — it
only wins if small-array reduce latency is materially lower.

Two kernel families, each a fori_loop of STEPS dependent iterations:
  chain1: one max-reduce per step (pure reduce-latency probe)
  chain3: max -> tie-argmin -> masked-sum extract (the FPS step's exact
          dependent-reduce structure, minus the vector d2 update)
at shapes (1,128), (8,128), (8,2048) [= the 16k-point FPS layout].

Per-step cost = (t(STEPS_HI) - t(STEPS_LO)) / (STEPS_HI - STEPS_LO), which
cancels dispatch + compile-cached call overhead.  Honest tunnel timing:
fresh input buffers per call, scalar fetch as the barrier.

Run: python scripts/bench_reduce_latency.py   (TPU; one job at a time)
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain1_kernel(x_ref, o_ref, *, steps):
    def body(j, s):
        return jnp.max(x_ref[:] + s) * 1e-12

    s = lax.fori_loop(0, steps, body, jnp.float32(0.0))
    o_ref[:] = jnp.full_like(o_ref, s)


def _chain3_kernel(x_ref, o_ref, *, steps):
    R, C = x_ref.shape
    iota = (lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + lax.broadcasted_iota(jnp.int32, (R, C), 1))
    NP = R * C

    def body(j, s):
        m = x_ref[:] + s
        mx = jnp.max(m)                                        # reduce 1
        best = jnp.min(jnp.where(m == mx, iota, NP))           # reduce 2
        lx = jnp.sum(jnp.where(iota == best, m, 0.0))          # reduce 3
        return lx * 1e-12

    s = lax.fori_loop(0, steps, body, jnp.float32(0.0))
    o_ref[:] = jnp.full_like(o_ref, s)


def _run(kernel, shape, steps):
    fn = pl.pallas_call(
        functools.partial(kernel, steps=steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    return jax.jit(fn)


def measure(kernel, shape, lo=2048, hi=18432, reps=5):
    f_lo, f_hi = _run(kernel, shape, lo), _run(kernel, shape, hi)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, shape, jnp.float32)
    float(jnp.sum(f_lo(x)))  # compile
    float(jnp.sum(f_hi(x)))
    per_step = []
    for i in range(reps):
        x = jax.random.uniform(jax.random.fold_in(k, i + 1), shape)
        x = jax.device_put(x)
        t0 = time.perf_counter(); float(jnp.sum(f_lo(x))); t_lo = time.perf_counter() - t0
        x2 = jax.device_put(x + 1e-7)
        t0 = time.perf_counter(); float(jnp.sum(f_hi(x2))); t_hi = time.perf_counter() - t0
        per_step.append((t_hi - t_lo) / (hi - lo))
    return float(np.median(per_step)) * 1e9  # ns/step


def main():
    print(f"devices: {jax.devices()}")
    shapes = [(1, 128), (8, 128), (8, 2048)]
    for name, kern in [("chain1 (1 reduce/step)", _chain1_kernel),
                       ("chain3 (max->tie->extract)", _chain3_kernel)]:
        for shape in shapes:
            ns = measure(kern, shape)
            print(f"{name:28s} shape={str(shape):11s} {ns:8.1f} ns/step")


if __name__ == "__main__":
    main()
