"""Benchmark: flagship 16k-point tooth-scan inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline follows BASELINE.json's north star — ">= 20x CPU-reference
throughput": value / (20 * cpu_reference_scans_per_sec), so vs_baseline >= 1
means the target is met.  The CPU reference number is measured once with
BENCH_CPU=1 (this same model on the XLA CPU backend — a generous stand-in for
the torch reference, which cannot run here without its CUDA extensions) and
pinned in bench_cpu_ref.json.

Note: inputs CYCLE through a pool of distinct device buffers — repeated calls
with identical buffers return cached results through the axon tunnel and give
fantasy numbers.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
N_POINTS = 16000
POOL = 8
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
CPU_REF_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_cpu_ref.json")

if os.environ.get("BENCH_CPU") == "1":
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import FLAGSHIP_SEG_ARGS, _build

    model, variables, _ = _build(FLAGSHIP_SEG_ARGS, N_POINTS, BATCH)

    fwd = jax.jit(lambda v, b: model.apply(v, b)[0])
    rng = np.random.default_rng(0)

    def fresh_batch():
        pos = jnp.asarray(rng.standard_normal((BATCH, N_POINTS, 3)).astype(np.float32))
        return {"pos": pos, "x": pos, "cls": jnp.zeros((BATCH, 1), jnp.int32)}

    # every iteration gets a NEVER-REPEATED buffer: repeated identical inputs
    # are served from a result cache in the axon path and time at ~0.3 ms
    batches = [fresh_batch() for _ in range(WARMUP + ITERS)]
    for i in range(WARMUP):
        out = fwd(variables, batches[i])
    jax.block_until_ready(out)

    t0 = time.time()
    for i in range(ITERS):
        out = fwd(variables, batches[WARMUP + i])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    scans_per_sec = BATCH / dt

    if os.environ.get("BENCH_CPU") == "1":
        with open(CPU_REF_FILE, "w") as f:
            json.dump({"cpu_scans_per_sec": scans_per_sec, "batch": BATCH,
                       "n_points": N_POINTS}, f)
        print(json.dumps({"metric": "cpu_reference_scans_per_sec",
                          "value": round(scans_per_sec, 4),
                          "unit": "scans/sec", "vs_baseline": 1.0}))
        return

    vs = None
    if os.path.exists(CPU_REF_FILE):
        with open(CPU_REF_FILE) as f:
            cpu = json.load(f)["cpu_scans_per_sec"]
        vs = scans_per_sec / (20.0 * cpu)
    print(json.dumps({"metric": "tooth_scans_per_sec_16k_inference",
                      "value": round(scans_per_sec, 3),
                      "unit": "scans/sec/chip",
                      "vs_baseline": round(vs, 3) if vs is not None else None}))


if __name__ == "__main__":
    main()
