"""HTTP serving endpoint — network front-end for the inference pipeline.

The reference stops at a training loop; a deployable framework needs a
service.  This is a dependency-free (stdlib ``http.server``) endpoint over
the same pipeline as ``engine.predict``: OBJ/NPY scan in, FDI labels out.

    python -m geot_tpu.engine.serve --cfg cfgs/tooth_semi/<x>.yaml \
        --ckpt <orbax dir | .pth> [--port 8756] [--fast]

API:
  GET  /healthz                    -> {"status": "ok", "scans_served": N}
  GET  /metrics                    -> Prometheus text exposition: request
                                      counters by outcome, request-latency
                                      histogram, scans served, uptime
  POST /predict?jaw={lower|upper}  body: .npy bytes (P, 3) float or OBJ text
                                   -> {"labels": [...FDI...], "n_points": P,
                                       "jaw": ..., "seconds": t}

Requests round-robin across one weight replica per local device, each behind
its own dispatch lock — HTTP throughput scales with chips (one scan per
device beats batching; the B=1 result from ``bench.py``), and within one
device concurrency comes from the FIFO device pipeline, not Python threads.
Model + upsample programs are compiled at startup via a warmup scan per
replica so the first requests pay no compile.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..core.config import EasyConfig
from .predict import (map_pred_to_fdi, load_model_and_params,
                      predict_scan)


class _ArtifactModel:
    """Duck-types the flax model for ``predict_scan`` over an AOT-exported
    forward (``engine.export``): ``apply`` ignores variables (they are baked
    into the artifact) and returns the logits as a 1-tuple."""

    def __init__(self, exported):
        self._call = exported.call

    def apply(self, variables, batch):
        return (self._call(batch["pos"], batch["cls"]),)


class _Metrics:
    """Prometheus-style request metrics (counter by outcome + latency
    histogram) behind its own lock, so scrapes never contend with the
    device-dispatch lock."""

    BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

    def __init__(self):
        self._lock = threading.Lock()
        self._t0 = time.time()
        self._outcomes = {"ok": 0, "error": 0}
        self._bucket_counts = [0] * (len(self.BUCKETS) + 1)  # +Inf last
        self._lat_sum = 0.0
        self._lat_count = 0

    def observe(self, seconds: float, ok: bool):
        with self._lock:
            self._outcomes["ok" if ok else "error"] += 1
            if ok:   # latency is only meaningful for served predictions
                i = 0
                while i < len(self.BUCKETS) and seconds > self.BUCKETS[i]:
                    i += 1
                self._bucket_counts[i] += 1
                self._lat_sum += seconds
                self._lat_count += 1

    def render(self, scans_served: int) -> str:
        with self._lock:
            lines = [
                "# HELP geot_requests_total predict requests by outcome",
                "# TYPE geot_requests_total counter",
                *(f'geot_requests_total{{outcome="{k}"}} {v}'
                  for k, v in self._outcomes.items()),
                "# HELP geot_request_seconds served-prediction latency",
                "# TYPE geot_request_seconds histogram",
            ]
            cum = 0
            for le, n in zip((*self.BUCKETS, "+Inf"), self._bucket_counts):
                cum += n
                lines.append(f'geot_request_seconds_bucket{{le="{le}"}} {cum}')
            lines += [
                f"geot_request_seconds_sum {self._lat_sum:.6f}",
                f"geot_request_seconds_count {self._lat_count}",
                "# HELP geot_scans_served_total scans run on the device "
                "(includes warmup-excluded resets)",
                "# TYPE geot_scans_served_total counter",
                f"geot_scans_served_total {scans_served}",
                "# HELP geot_uptime_seconds process uptime",
                "# TYPE geot_uptime_seconds gauge",
                f"geot_uptime_seconds {time.time() - self._t0:.3f}",
            ]
            return "\n".join(lines) + "\n"


class _Service:
    """Model state + a lock serialising device dispatch across HTTP threads."""

    def __init__(self, cfg, ckpt=None, warmup: bool = True,
                 artifact: str | None = None):
        self.cfg = cfg
        if artifact is not None:
            # AOT serving: no model code/config needed — shapes (incl. the
            # sampled point count) come from the artifact itself
            from .export import load_exported

            exported = load_exported(artifact)
            avals = exported.in_avals
            if (len(avals) != 2 or len(avals[0].shape) != 3
                    or avals[0].shape[-1] != 3 or avals[0].shape[0] != 1):
                raise ValueError(
                    f"artifact {artifact} must be an embed_params export with "
                    f"(pos (1,N,3), cls (1,1)) inputs (the endpoint serves "
                    f"one scan per request); got input specs "
                    f"{[tuple(a.shape) for a in avals]} — re-export with "
                    f"export_forward(..., embed_params=True, batch=1)")
            self.num_points = int(avals[0].shape[1])
            self.model, self.variables = _ArtifactModel(exported), None
        else:
            self.num_points = int(cfg.get("num_points", 16000))
            self.model, self.variables = load_model_and_params(cfg, ckpt)
        # one (device, weight replica, dispatch lock) per local device:
        # requests round-robin across replicas so HTTP throughput scales
        # with chips (one scan per device beats batching — the B=1 result
        # from bench.py).  Artifact mode stays single-replica: the AOT
        # executable is loaded for the default device.
        import jax

        devs = jax.local_devices()
        if self.variables is not None and len(devs) > 1:
            self.replicas = [(d, jax.device_put(self.variables, d),
                              threading.Lock()) for d in devs]
        else:
            self.replicas = [(None, self.variables, threading.Lock())]
        self._rr = 0
        self._rr_lock = threading.Lock()
        self.metrics = _Metrics()
        self.scans_served = 0
        if warmup:   # compile forward + one upsample bucket, EVERY replica
            pts = np.random.default_rng(0).standard_normal((8192, 3))
            for _ in self.replicas:
                self.predict(pts.astype(np.float32), jaw=0)
            self.scans_served = 0

    def predict(self, points: np.ndarray, jaw: int):
        with self._rr_lock:
            i = self._rr
            self._rr += 1
        device, variables, lock = self.replicas[i % len(self.replicas)]
        with lock:
            pred, _ = predict_scan(self.model, variables, points,
                                   jaw=jaw, num_points=self.num_points,
                                   device=device)
        with self._rr_lock:
            self.scans_served += 1
        return map_pred_to_fdi(pred, jaw)


def _parse_body(body: bytes) -> np.ndarray:
    if body[:6] == b"\x93NUMPY":
        pts = np.load(io.BytesIO(body))
    else:  # OBJ text: keep `v x y z` lines
        pts = np.array([[float(t) for t in line.split()[1:4]]
                        for line in body.decode().splitlines()
                        if line.startswith("v ")], dtype=np.float32)
    pts = np.asarray(pts, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[1] != 3 or len(pts) < 4:
        raise ValueError(f"expected (P>=4, 3) points, got {pts.shape}")
    return pts


# request hardening: a single oversized POST must not be able to exhaust
# host memory, and a stalled/truncated upload must not pin a worker thread
# forever.  64 MiB covers any realistic scan (a 1M-point f32 .npy is 12 MB).
MAX_BODY_BYTES = int(os.environ.get("GEOT_SERVE_MAX_BODY", 64 << 20))
READ_TIMEOUT_S = float(os.environ.get("GEOT_SERVE_READ_TIMEOUT", 30))


def make_handler(service: _Service):
    class Handler(BaseHTTPRequestHandler):
        # socket timeout for the whole request read (header + body): a
        # Content-Length lie with a stalled body times out instead of
        # blocking the thread indefinitely
        timeout = READ_TIMEOUT_S

        def log_message(self, *a):  # quiet; the service logs via responses
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._send(200, {"status": "ok",
                                 "scans_served": service.scans_served})
            elif path == "/metrics":
                body = service.metrics.render(service.scans_served).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            cl = self.headers.get("Content-Length")
            if cl is None:
                self._send(411, {"error": "Content-Length required"})
                return
            try:
                length = int(cl)
            except ValueError:
                self._send(400, {"error": f"bad Content-Length: {cl!r}"})
                return
            if length < 0:
                self._send(400, {"error": f"bad Content-Length: {cl!r}"})
                return
            if length > MAX_BODY_BYTES:
                # reject BEFORE reading: the cap is what protects host
                # memory from an oversized (or lying) header
                self._send(413, {"error": f"body {length} bytes exceeds "
                                          f"limit {MAX_BODY_BYTES}"})
                return
            try:
                jaw_s = parse_qs(url.query).get("jaw", ["lower"])[0]
                if jaw_s not in ("lower", "upper"):
                    raise ValueError(f"jaw must be lower|upper, got {jaw_s!r}")
                jaw = 0 if jaw_s == "lower" else 1
                body = self.rfile.read(length)
                if len(body) != length:
                    raise ValueError(
                        f"truncated body: got {len(body)} of {length} bytes")
                points = _parse_body(body)
                t0 = time.time()
                labels = service.predict(points, jaw)
                dt = time.time() - t0
                service.metrics.observe(dt, ok=True)
                self._send(200, {"labels": labels, "n_points": len(labels),
                                 "jaw": jaw_s, "seconds": round(dt, 4)})
            except Exception as e:  # noqa: BLE001 — report, keep serving
                service.metrics.observe(0.0, ok=False)
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(cfg, ckpt=None, port: int = 8756, warmup: bool = True,
          artifact: str | None = None, host: str = "127.0.0.1"):
    """Build the service and return a started ``ThreadingHTTPServer``
    (caller owns shutdown; port 0 picks a free port)."""
    service = _Service(cfg, ckpt, warmup=warmup, artifact=artifact)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service   # introspection (tests, embedding callers)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd


def main(argv=None):
    parser = argparse.ArgumentParser("GeoT-TPU serving endpoint")
    parser.add_argument("--cfg", default=None,
                        help="model config (not needed with --artifact)")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--artifact", default=None,
                        help="serve an AOT StableHLO export (engine.export) "
                             "— no model code or config required")
    parser.add_argument("--port", type=int, default=8756)
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address (0.0.0.0 to accept non-local "
                             "connections, e.g. from outside a container)")
    parser.add_argument("--fast", action="store_true",
                        help="stratified-FPS + fast_graph serving path")
    args, opts = parser.parse_known_args(argv)

    cfg = None
    if args.artifact and (args.ckpt or args.fast or args.cfg or opts):
        # the artifact bakes weights, shapes, AND serving mode at export time
        parser.error("--artifact conflicts with --cfg/--ckpt/--fast/overrides: "
                     "those choices were baked in at export; re-export to "
                     "change them")
    if args.cfg:
        cfg = EasyConfig()
        cfg.load(args.cfg, recursive=True)
        cfg.update(opts)
        if args.fast:
            cfg.model.segmentor_args.fast_pyramid = 1024
            cfg.model.segmentor_args.fast_graph = True
    elif not args.artifact:
        parser.error("--cfg or --artifact is required")

    httpd = serve(cfg, args.ckpt, port=args.port, artifact=args.artifact,
                  host=args.host)
    print(f"serving on http://{httpd.server_address[0]}:"
          f"{httpd.server_address[1]} (POST /predict, GET /healthz)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
