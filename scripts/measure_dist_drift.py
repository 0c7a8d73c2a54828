"""Pin the multi-host trajectory-drift envelope numerically (VERDICT r4 #6).

Runs the SAME tiny semi config twice through the real multi-host wiring
(``tests/dist_worker.py``): once as 1 process x 8 CPU devices, once as
2 processes x 4 devices (Gloo collectives), both with per-step full-precision
loss logging and ``head_dropout``/``drop_path`` off (dropout masks are
batch-position-dependent; see the worker docstring).  The ONLY difference
between the two runs is the collective implementation (Gloo tree-reduce vs
XLA's in-process all-reduce) and the host-sharded batch assembly, so the
per-step relative loss difference IS the collective-fp drift envelope,
amplified over steps by the semi step's discrete structures (pseudo-label /
anchor argmax).

Writes ``log/dist_drift.json``: per-step rel diffs, per-epoch maxima, and
the global envelope that justifies ``DRIFT_ENVELOPE_REL`` in
``tests/test_multiprocess_dist.py``.

    python scripts/measure_dist_drift.py [--epochs 6] [--out log/dist_drift.json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

STEPLOSS = re.compile(
    r"steploss (\d+)/(\d+) ([\d.eE+-]+) sup ([\d.eE+-]+) unsup ([\d.eE+-]+)")


def _run(nproc, devices_each, root, epochs):
    from geot_tpu.parallel import find_free_port

    port = find_free_port()
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_each}",
        "JAX_DEFAULT_MATMUL_PRECISION": "highest",
        "GEOT_LOG_STEP_LOSS": "1",
        "GEOT_DIST_EXTRA_OVERRIDES": json.dumps(
            [f"epochs={epochs}", f"val_freq={epochs}"]),
    })
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "tests", "dist_worker.py"),
         str(port), str(i), str(nproc), str(root)],
        env=env, cwd=ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(nproc)]
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"worker {i} rc={p.returncode}:\n{out[-3000:]}")
    return {(int(m.group(1)), int(m.group(2))): float(m.group(3))
            for m in STEPLOSS.finditer(outs[0])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(ROOT, "log",
                                                  "dist_drift.json"))
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        base = _run(1, 8, os.path.join(tmp, "base"), args.epochs)
        os.makedirs(os.path.join(tmp, "dist"), exist_ok=True)
        dist = _run(2, 4, os.path.join(tmp, "dist"), args.epochs)
    assert set(base) == set(dist) and base, "step sets differ"

    rel = {k: abs(dist[k] - base[k]) / max(abs(base[k]), 1e-12)
           for k in sorted(base)}
    by_epoch = {}
    for (ep, st), r in rel.items():
        by_epoch.setdefault(ep, []).append(r)
    first = rel[min(rel)]
    report = {
        "config": "cfgs/tooth_semi/smoke.yaml + dist_worker OVERRIDES "
                  f"(head_dropout=0, drop_path=0), epochs={args.epochs}",
        "comparison": "2proc x 4dev (Gloo) vs 1proc x 8dev (XLA all-reduce), "
                      "identical global batches and init",
        "first_step_rel_diff": first,
        "per_epoch_max_rel_diff": {str(ep): max(v)
                                   for ep, v in sorted(by_epoch.items())},
        "envelope_max_rel_diff": max(rel.values()),
        "n_steps": len(rel),
        "note": "first step = pure collective-fp reduction-order noise; "
                "later steps amplify it through pseudo-label/anchor argmax "
                "discontinuities. tests/test_multiprocess_dist.py's "
                "DRIFT_ENVELOPE_REL must stay >= a safety factor over "
                "envelope_max_rel_diff. A measured 0.0 at 2proc x 4dev is "
                "REAL, not vacuous (losses logged at 1e-9 resolution): the "
                "hierarchical reduce's bracketing ((4-local)+(4-local)) "
                "coincides with the in-process 8-way tree reduce, so the "
                "trajectories are bit-identical at this topology; the test "
                "tolerance is the guard band for topologies whose "
                "bracketing differs.",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
