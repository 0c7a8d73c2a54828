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

_IS_CPU = os.environ.get("BENCH_CPU") == "1"
BATCH = int(os.environ.get("BENCH_BATCH", "1"))  # B=1 pipelines best: exact
# 74 vs 67@B2, 60@B8; fast mode 165 vs 153@B2, 145@B4 scans/s (r3 measured)
N_POINTS = 16000
WARMUP = 1 if _IS_CPU else 2
ITERS = int(os.environ.get("BENCH_ITERS", "1" if _IS_CPU else "32"))
CPU_REF_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_cpu_ref.json")

if os.environ.get("BENCH_CPU") == "1":
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"


def _measure(seg_args, compute_flops=True):
    """Build the model at ``seg_args`` and time ITERS forward passes.

    The scalar reduce forces full compute per call with a 4-byte D2H;
    ``block_until_ready`` is a NO-OP through the axon tunnel and repeated
    identical input buffers hit a result cache, so honest timing needs
    (a) never-repeated buffers, (b) a value fetch as barrier."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build

    model, variables, _ = _build(seg_args, N_POINTS, BATCH)
    fwd = jax.jit(lambda v, b: jnp.sum(model.apply(v, b)[0]))
    rng = np.random.default_rng(0)
    flops = 0.0

    def fresh_batch():
        pos = jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 3)).astype(np.float32))
        return {"pos": pos, "x": pos, "cls": jnp.zeros((BATCH, 1), jnp.int32)}

    batches = [fresh_batch() for _ in range(WARMUP + ITERS)]
    if compute_flops:
        try:
            # XLA's own flop count for the whole compiled forward — feeds
            # the MFU field (docs/PERF.md derivation)
            flops = float((fwd.lower(variables, batches[0]).compile()
                           .cost_analysis() or {}).get("flops", 0))
        except Exception:
            pass
    for i in range(WARMUP):
        float(fwd(variables, batches[i]))

    # dispatch everything, fetch the last scalar: device executes FIFO, so
    # one round-trip covers all ITERS computations
    t0 = time.time()
    outs = [fwd(variables, batches[WARMUP + i]) for i in range(ITERS)]
    float(outs[-1])
    dt = (time.time() - t0) / ITERS
    return BATCH / dt, flops


_PEAK_TFLOPS = {
    # dense bf16 peak per chip (public spec sheets); MFU is quoted against
    # the bf16 MXU peak by convention even where f32 stages run at lower
    # throughput, so these MFUs are conservative
    "v6e": 918.0, "v6": 918.0, "v5p": 459.0, "v5e": 197.0, "v5 lite": 197.0,
    "v5litepod": 197.0, "v4": 275.0, "v3": 123.0, "v2": 46.0,
}


def _peak_tflops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak, kind
    return None, kind


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import FLAGSHIP_SEG_ARGS

    seg_args = dict(FLAGSHIP_SEG_ARGS)
    # bf16 compute path (+36% measured); BENCH_DTYPE=float32 for the f32 number
    seg_args["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    exact_args = dict(seg_args)
    # Serving default: stratified decoder pyramid — true-FPS prefix of 1024
    # + bit-reversed-Morton fill above (quality-neutral: val mIoU -0.08 vs
    # the exact pyramid on the committed 300-epoch ckpt, 133 vs 96 scans/s;
    # log/fast_pyramid_eval.json).  BENCH_FAST_PYRAMID overrides: "0" =
    # exact full-FPS pyramid, "1" = tokenizer-only FPS, int = prefix length.
    fp = os.environ.get("BENCH_FAST_PYRAMID", "1024")
    if fp == "1":
        seg_args["fast_pyramid"] = True
    elif fp != "0":
        seg_args["fast_pyramid"] = int(fp)
    # fast_graph: DGCNN second edge conv reuses cross-level kNN indices
    # (serving order only).  Quality parity (0.7924 vs 0.7925 val mIoU)
    # requires the 15-epoch serving fine-tune recipe — committed ckpt +
    # evidence in log/tooth_semi/serving_ft_fastgraph-seed42-ep315 and
    # log/fast_pyramid_eval.json.  BENCH_FAST_GRAPH=0 to disable.
    if fp != "0" and os.environ.get("BENCH_FAST_GRAPH", "1") == "1":
        seg_args["fast_graph"] = True

    scans_per_sec, flops = _measure(seg_args)

    if os.environ.get("BENCH_CPU") == "1":
        with open(CPU_REF_FILE, "w") as f:
            json.dump({"cpu_scans_per_sec": scans_per_sec, "batch": BATCH,
                       "n_points": N_POINTS}, f)
        print(json.dumps({"metric": "cpu_reference_scans_per_sec",
                          "value": round(scans_per_sec, 4),
                          "unit": "scans/sec", "vs_baseline": 1.0}))
        return

    # exact parity-mode number in the same line (VERDICT r3 #3: an
    # exact-mode perf regression must be visible in the driver artifact).
    # BENCH_DUAL=0 skips the second compile+measure.
    value_exact = None
    if seg_args != exact_args and os.environ.get("BENCH_DUAL", "1") == "1":
        # flops skipped: the MFU field belongs to the headline mode, and
        # the extra AOT compile would cost ~30 s of bench time
        value_exact, _ = _measure(exact_args, compute_flops=False)
    elif seg_args == exact_args:
        value_exact = scans_per_sec

    vs = None
    if os.path.exists(CPU_REF_FILE):
        with open(CPU_REF_FILE) as f:
            cpu = json.load(f)["cpu_scans_per_sec"]
        vs = scans_per_sec / (20.0 * cpu)
    rec = {"metric": "tooth_scans_per_sec_16k_inference",
           "value": round(scans_per_sec, 3),
           "unit": "scans/sec/chip",
           "vs_baseline": round(vs, 3) if vs is not None else None}
    if value_exact is not None:
        rec["value_exact"] = round(value_exact, 3)
    if flops:
        # achieved dense TFLOP/s and fraction of the chip's bf16 peak; the
        # serving forward is neighbour-op-bound (see docs/PERF.md), so a
        # low MFU here is the workload, not a tuning gap
        tflops = flops * (scans_per_sec / BATCH) / 1e12
        rec["tflops"] = round(tflops, 2)
        peak, kind = _peak_tflops()
        if peak:
            rec["mfu"] = round(tflops / peak, 4)
            rec["device_kind"] = kind
    print(json.dumps(rec))


def _supervised():
    """Run the bench in a fresh child process, retrying once on failure.

    The axon TPU relay is single-tenant: a process killed mid-claim wedges the
    chip and the next contact fails (FAILED_PRECONDITION) or hangs ~90 s until
    the claim expires.  A fresh interpreter per attempt avoids corrupt backend
    state; the sleep between attempts lets a stale claim expire.  Whatever
    happens, exactly one JSON line goes to stdout so the driver can parse it.
    """
    import subprocess

    env = dict(os.environ)
    env["_GEOT_BENCH_CHILD"] = "1"
    here = os.path.abspath(__file__)
    last_err = "unknown"
    for attempt in range(2):
        if attempt:
            time.sleep(120)  # let any stale single-tenant TPU claim expire
        try:
            proc = subprocess.run(
                [sys.executable, here], env=env, cwd=os.path.dirname(here),
                stdout=subprocess.PIPE, timeout=1800)
            out = proc.stdout.decode(errors="replace")
            json_lines = [l for l in out.splitlines() if l.startswith("{")]
            if proc.returncode == 0 and json_lines:
                print(json_lines[-1])
                return
            last_err = (f"rc={proc.returncode}; tail: "
                        + out[-400:].replace("\n", " | "))
        except subprocess.TimeoutExpired:
            last_err = "bench child timed out after 1800s"
        print(f"bench attempt {attempt + 1} failed: {last_err}",
              file=sys.stderr)
    print(json.dumps({"metric": "tooth_scans_per_sec_16k_inference",
                      "value": None, "unit": "scans/sec/chip",
                      "vs_baseline": None, "error": last_err[:500]}))


if __name__ == "__main__":
    if os.environ.get("_GEOT_BENCH_CHILD") == "1":
        main()
    else:
        _supervised()
