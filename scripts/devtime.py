"""Device-time microbenchmark harness for the axon-tunnelled TPU.

Per CLAUDE.md the tunnel makes naive timing lie (~30 ms dispatch per call,
result caching on repeated buffers). This harness times N iterations of a
function inside ONE jit, with fresh on-device random inputs per iteration
(lax.scan over split keys), and subtracts an empty-body baseline — giving
honest per-iteration device time with a single dispatch.

Usage: from scripts.devtime import devtime; devtime(fn_taking_x, shape, iters)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax


def _runner(f, shape, n_iter, dtype=jnp.float32):
    @jax.jit
    def run(key):
        def body(c, k):
            x = jax.random.normal(k, shape, dtype)
            r = f(x)
            leaves = jax.tree_util.tree_leaves(r)
            acc = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + acc, None
        keys = jax.random.split(key, n_iter)
        tot, _ = lax.scan(body, jnp.float32(0.0), keys)
        return tot

    return run


def devtime(f, shape, n_iter=30, reps=3, dtype=jnp.float32, label=None):
    """Median per-iteration device time of ``f(x)`` minus harness overhead."""
    import numpy as np

    key = jax.random.PRNGKey(0)
    base = _runner(lambda x: jnp.sum(x), shape, n_iter, dtype)
    run = _runner(f, shape, n_iter, dtype)
    float(base(key)); float(run(key))  # compile + warm
    ts_b, ts_f = [], []
    for i in range(reps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter(); float(base(k)); ts_b.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run(k)); ts_f.append(time.perf_counter() - t0)
    ms = 1e3 * (np.median(ts_f) - np.median(ts_b)) / n_iter
    if label:
        print(f"{label}: {ms:.3f} ms/iter")
    return ms
