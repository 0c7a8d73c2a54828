"""HTTP serving load test (VERDICT r4 #7).

Starts the real ``engine.serve`` endpoint in-process (per-device weight
replicas, round-robin dispatch), fires N concurrent stdlib clients each
posting M DISTINCT random scans (identical buffers would hit the axon
tunnel's result cache and flatter the numbers), and records client-side
p50/p90/p99 latency + aggregate scans/s.  Cross-checks the server's own
Prometheus histogram (``/metrics``) against the client-side view: counts
must match exactly, the mean must agree.

Artifact run (TPU, committed serving checkpoint):

    python scripts/serve_load.py \
        --ckpt log/tooth_semi/serving_ft_fastgraph-seed42-ep315/checkpoint/serving_ft_fastgraph_params_only \
        --fast --clients 8 --per-client 16 --out log/serve_load.json

The concurrency/metrics mechanics are regression-tested on CPU with a tiny
model in ``tests/test_serve_load.py`` (which imports ``run_load``).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import threading
import time
import urllib.request

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)


def _parse_prom(text: str):
    out = {"buckets": {}}
    for line in text.splitlines():
        m = re.match(r'geot_request_seconds_bucket\{le="([^"]+)"\} (\d+)', line)
        if m:
            out["buckets"][m.group(1)] = int(m.group(2))
        for key in ("geot_request_seconds_sum", "geot_request_seconds_count",
                    "geot_scans_served_total"):
            if line.startswith(key + " "):
                out[key] = float(line.split()[1])
        m = re.match(r'geot_requests_total\{outcome="(\w+)"\} (\d+)', line)
        if m:
            out[f"requests_{m.group(1)}"] = int(m.group(2))
    return out


def run_load(cfg, ckpt=None, clients: int = 8, per_client: int = 16,
             scan_points: int = 16000, seed: int = 0):
    """Start serve(), run the load, return the report dict."""
    from geot_tpu.engine.serve import serve

    httpd = serve(cfg, ckpt=ckpt, port=0, warmup=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    latencies = [[] for _ in range(clients)]
    errors = []

    def client(ci):
        rng = np.random.default_rng(seed + ci)
        for _ in range(per_client):
            pts = rng.standard_normal((scan_points, 3)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, pts)
            req = urllib.request.Request(
                f"{base}/predict?jaw={'lower' if ci % 2 else 'upper'}",
                data=buf.getvalue(), method="POST")
            t0 = time.time()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    d = json.load(r)
                assert d["n_points"] == scan_points, d
                latencies[ci].append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 — collected, asserted below
                errors.append(f"client {ci}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    with urllib.request.urlopen(f"{base}/metrics", timeout=60) as r:
        prom = _parse_prom(r.read().decode())
    httpd.shutdown()

    lats = np.asarray(sorted(sum(latencies, [])))
    total = clients * per_client
    report = {
        "clients": clients, "per_client": per_client,
        "scan_points": scan_points,
        "n_replicas": len(httpd.service.replicas),
        "completed": int(len(lats)), "errors": errors,
        "wall_s": round(wall, 3),
        "scans_per_sec": round(len(lats) / wall, 3),
        "latency_s": {
            "p50": round(float(np.percentile(lats, 50)), 4),
            "p90": round(float(np.percentile(lats, 90)), 4),
            "p99": round(float(np.percentile(lats, 99)), 4),
            "mean": round(float(lats.mean()), 4),
            "max": round(float(lats.max()), 4),
        },
        "prometheus": prom,
    }
    # ---- server-side histogram must agree with the client-side view ----
    assert not errors, errors[:5]
    assert prom["geot_request_seconds_count"] == total, prom
    assert prom.get("requests_ok") == total, prom
    server_mean = prom["geot_request_seconds_sum"] / total
    # server mean excludes HTTP/serialisation overhead, so it is <= the
    # client mean but must be in the same regime
    assert server_mean <= report["latency_s"]["mean"] + 1e-3, (
        server_mean, report["latency_s"])
    report["server_mean_s"] = round(server_mean, 4)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        ROOT, "cfgs", "tooth_semi", "transformer_finetune_fixmatch_ntm.yaml"))
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--per-client", type=int, default=16)
    ap.add_argument("--points", type=int, default=16000)
    ap.add_argument("--out", default=os.path.join(ROOT, "log",
                                                  "serve_load.json"))
    args = ap.parse_args()

    from geot_tpu.core.config import EasyConfig

    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    if args.fast:
        cfg.model.segmentor_args.fast_pyramid = 1024
        cfg.model.segmentor_args.fast_graph = True
    report = run_load(cfg, ckpt=args.ckpt, clients=args.clients,
                      per_client=args.per_client, scan_points=args.points)
    report["config"] = {"cfg": args.cfg, "ckpt": args.ckpt,
                        "fast": args.fast}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "prometheus"}, indent=2))


if __name__ == "__main__":
    main()
