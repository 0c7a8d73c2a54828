"""HTTP serving endpoint end-to-end test (stdlib client, tiny model)."""
import io
import json
import os
import urllib.request

import jax
import numpy as np
import pytest

from geot_tpu.core.config import EasyConfig
from geot_tpu.data.tooth_semi import _synthetic_scan
from geot_tpu.engine.serve import serve

CFG = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi",
                   "smoke.yaml")


@pytest.mark.slow
def test_serve_end_to_end():
    cfg = EasyConfig()
    cfg.load(CFG, recursive=True)
    cfg.num_points = 256
    httpd = serve(cfg, ckpt=None, port=0, warmup=False)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=300) as r:
            assert json.load(r)["status"] == "ok"

        pts, _ = _synthetic_scan(3, 4000)
        buf = io.BytesIO()
        np.save(buf, pts.astype(np.float32))
        req = urllib.request.Request(f"{base}/predict?jaw=upper",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            d = json.load(r)
        assert d["n_points"] == 4000 and d["jaw"] == "upper"
        assert all(l == 0 or 11 <= l <= 28 for l in d["labels"])

        # OBJ text body on the same server (second request, no recompile)
        obj = "".join(f"v {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n" for p in pts)
        req = urllib.request.Request(f"{base}/predict?jaw=lower",
                                     data=obj.encode(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            d = json.load(r)
        assert d["n_points"] == 4000
        assert all(l == 0 or 31 <= l <= 48 for l in d["labels"])

        with urllib.request.urlopen(f"{base}/healthz", timeout=300) as r:
            assert json.load(r)["scans_served"] == 2

        # malformed body -> 400, server stays up
        req = urllib.request.Request(f"{base}/predict",
                                     data=b"garbage", method="POST")
        try:
            urllib.request.urlopen(req, timeout=300)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=300) as r:
            assert json.load(r)["status"] == "ok"

        # /metrics: Prometheus text with 2 ok + 1 error and a consistent
        # latency histogram (bucket counts are cumulative; +Inf == count)
        with urllib.request.urlopen(f"{base}/metrics", timeout=300) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        m = {line.rsplit(" ", 1)[0]: line.rsplit(" ", 1)[1]
             for line in text.splitlines() if not line.startswith("#")}
        assert m['geot_requests_total{outcome="ok"}'] == "2"
        assert m['geot_requests_total{outcome="error"}'] == "1"
        assert m['geot_request_seconds_bucket{le="+Inf"}'] == "2"
        assert m["geot_request_seconds_count"] == "2"
        assert float(m["geot_request_seconds_sum"]) > 0
        assert m["geot_scans_served_total"] == "2"
        assert float(m["geot_uptime_seconds"]) > 0
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_serve_from_aot_artifact(tmp_path):
    """--artifact serves a StableHLO export with no model code/config; labels
    match the model-backed service exactly (same sampling seed)."""
    import urllib.error

    from geot_tpu.engine.export import export_forward
    from geot_tpu.engine.predict import load_model_and_params, predict_scan

    cfg = EasyConfig()
    cfg.load(CFG, recursive=True)
    cfg.num_points = 256
    model, variables = load_model_and_params(cfg, None)
    art = str(tmp_path / "model.bin")
    export_forward(model, variables, n_points=256, batch=1, out=art)

    httpd = serve(None, artifact=art, port=0, warmup=False)
    port = httpd.server_address[1]
    try:
        pts, _ = _synthetic_scan(5, 3000)
        buf = io.BytesIO()
        np.save(buf, pts.astype(np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?jaw=lower",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            d = json.load(r)
        assert d["n_points"] == 3000

        # byte-identical to the in-process model path
        pred_direct, _ = predict_scan(model, variables, pts, jaw=0,
                                      num_points=256)
        from geot_tpu.engine.predict import _ID2FDI_LOWER
        want = [int(_ID2FDI_LOWER[int(c)]) for c in pred_direct]
        assert d["labels"] == want
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_serve_concurrent_requests(tmp_path):
    """Parallel clients all succeed; the device-dispatch lock serialises
    compute without dropping or corrupting responses."""
    import threading

    cfg = EasyConfig()
    cfg.load(CFG, recursive=True)
    cfg.num_points = 256
    httpd = serve(cfg, ckpt=None, port=0, warmup=False)
    port = httpd.server_address[1]
    results, errors = [None] * 4, []

    def worker(i):
        try:
            pts, _ = _synthetic_scan(20 + i, 2000 + 100 * i)
            buf = io.BytesIO()
            np.save(buf, pts.astype(np.float32))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict?jaw=lower",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                results[i] = json.load(r)
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        for i, d in enumerate(results):
            assert d["n_points"] == 2000 + 100 * i
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                    timeout=300) as r:
            assert json.load(r)["scans_served"] == 4
        # one weight replica per local device (8 on the CPU test mesh), and
        # the round-robin dispatched every request
        svc = httpd.service
        assert len(svc.replicas) == len(jax.local_devices()) > 1
        assert svc._rr == 4
        assert all(dev is not None for dev, _, _ in svc.replicas)
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_serve_hardening_fuzz():
    """VERDICT r3 #5: oversized/truncated/malformed requests are rejected
    with the right status codes, never read into memory when oversized, and
    never take the server down."""
    import socket

    cfg = EasyConfig()
    cfg.load(CFG, recursive=True)
    cfg.num_points = 256
    httpd = serve(cfg, ckpt=None, port=0, warmup=False)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def raw_request(payload: bytes, shutdown_wr: bool = False) -> bytes:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        try:
            s.sendall(payload)
            if shutdown_wr:
                s.shutdown(socket.SHUT_WR)
            chunks = []
            while True:
                b = s.recv(65536)
                if not b:
                    break
                chunks.append(b)
            return b"".join(chunks)
        finally:
            s.close()

    def status_of(resp: bytes) -> int:
        return int(resp.split(b"\r\n", 1)[0].split()[1])

    try:
        # 100 MB Content-Length lie with no body: rejected up-front (413),
        # BEFORE any read — the server must answer instantly, not wait for
        # a body that never comes
        import time as _time
        t0 = _time.time()
        resp = raw_request(
            b"POST /predict HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: 104857600\r\n\r\n")
        assert status_of(resp) == 413
        assert _time.time() - t0 < 10

        # missing Content-Length -> 411
        resp = raw_request(
            b"POST /predict HTTP/1.1\r\nHost: x\r\n\r\n", shutdown_wr=True)
        assert status_of(resp) == 411

        # garbage Content-Length -> 400
        resp = raw_request(
            b"POST /predict HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: banana\r\n\r\n", shutdown_wr=True)
        assert status_of(resp) == 400

        # truncated body (header promises 1000 bytes, sends 10, half-close)
        resp = raw_request(
            b"POST /predict HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: 1000\r\n\r\n0123456789", shutdown_wr=True)
        assert status_of(resp) == 400
        assert b"truncated" in resp

        # garbage OBJ text (non-numeric vertex fields) -> 400
        bad_obj = b"v one two three\nv 1 2\nnot an obj line\n"
        req = urllib.request.Request(f"{base}/predict", data=bad_obj,
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=300)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # binary garbage that fakes the NPY magic -> 400
        req = urllib.request.Request(f"{base}/predict",
                                     data=b"\x93NUMPY" + os.urandom(64),
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=300)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # the server survived all of it
        with urllib.request.urlopen(f"{base}/healthz", timeout=300) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        httpd.shutdown()
