"""Concurrency/metrics mechanics of the serving load harness (tiny model,
CPU).  The real-throughput artifact comes from ``scripts/serve_load.py``
on the chip (``log/serve_load.json``); this test pins the shared
machinery: concurrent clients all succeed, the Prometheus histogram
agrees with the client-side count/mean, and per-device replicas are used.
"""
import os

import jax
import pytest

from geot_tpu.core.config import EasyConfig

CFG = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi",
                   "smoke.yaml")


@pytest.mark.slow
def test_serve_load_concurrent_clients_and_metrics():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from serve_load import run_load

    cfg = EasyConfig()
    cfg.load(CFG, recursive=True)
    cfg.num_points = 256
    report = run_load(cfg, ckpt=None, clients=4, per_client=3,
                      scan_points=1000)
    assert report["completed"] == 12 and not report["errors"]
    assert report["prometheus"]["geot_request_seconds_count"] == 12
    assert report["scans_per_sec"] > 0
    # 8 virtual CPU devices -> per-device weight replicas engaged
    assert report["n_replicas"] == len(jax.local_devices())
    # histogram buckets are cumulative and end at the total
    buckets = report["prometheus"]["buckets"]
    assert buckets["+Inf"] == 12
