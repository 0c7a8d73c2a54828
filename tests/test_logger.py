"""Experiment-dir + logging helpers (reference ``openpoints/utils/logger.py``)
and the CLI entry's cfg construction."""
import logging
import os

import numpy as np

from geot_tpu.core.config import EasyConfig
from geot_tpu.core.logger import (generate_exp_directory,
                                  resume_exp_directory, setup_logger_dist)


def test_generate_exp_directory(tmp_path):
    cfg = EasyConfig()
    cfg.root_dir = str(tmp_path)
    run_dir = generate_exp_directory(cfg, tags=["tooth", "train", "cfgA",
                                                "seed1"])
    assert os.path.isdir(run_dir)
    assert os.path.isdir(cfg.ckpt_dir)
    assert cfg.run_name.startswith("tooth-train-cfgA-seed1-")
    assert cfg.log_path.endswith(".log")
    # unique names on repeat calls (timestamp + uuid suffix)
    cfg2 = EasyConfig()
    cfg2.root_dir = str(tmp_path)
    run_dir2 = generate_exp_directory(cfg2, tags=["tooth", "train", "cfgA",
                                                  "seed1"])
    assert run_dir2 != run_dir


def test_resume_exp_directory_recovers_run(tmp_path):
    cfg = EasyConfig()
    cfg.root_dir = str(tmp_path)
    generate_exp_directory(cfg, tags=["exp"])
    ckpt = os.path.join(cfg.ckpt_dir, "exp_ckpt_latest")
    os.makedirs(ckpt, exist_ok=True)

    cfg2 = EasyConfig({"mode": "resume"})
    resume_exp_directory(cfg2, pretrained_path=ckpt)
    assert cfg2.run_dir == cfg.run_dir
    assert cfg2.ckpt_dir == cfg.ckpt_dir
    assert cfg2.run_name == cfg.run_name


def test_setup_logger_writes_file(tmp_path):
    log_path = str(tmp_path / "x.log")
    setup_logger_dist(log_path, 0, name="geot_test_logger")
    logging.getLogger().info("hello from the test")
    for h in logging.getLogger().handlers:
        h.flush()
    assert os.path.exists(log_path)
    assert "hello from the test" in open(log_path).read()


def test_parse_and_run_builds_cfg(tmp_path, monkeypatch):
    """CLI shape: --cfg + key=value overrides, run-dir generation, cfg dump
    (reference ``train.py:904-950``)."""
    import geot_tpu.engine.train as T

    captured = {}
    monkeypatch.setattr(T, "main", lambda cfg: captured.update(cfg=cfg) or {})
    monkeypatch.chdir(tmp_path)
    T.parse_and_run(["--cfg",
                     os.path.join(os.path.dirname(__file__), "..", "cfgs",
                                  "tooth_semi", "smoke.yaml"),
                     "lr=0.002", "seed=5"])
    cfg = captured["cfg"]
    assert cfg.lr == 0.002 and cfg.seed == 5
    assert cfg.task_name == "tooth_semi"
    assert cfg.cfg_basename == "smoke"
    assert os.path.exists(os.path.join(cfg.run_dir, "cfg.yaml"))


def test_parse_and_run_eval_keeps_run_cfg(tmp_path, monkeypatch):
    """Eval-only invocations reuse the training run dir and must NOT clobber
    its cfg.yaml (the run's provenance — an eval with different model
    overrides used to overwrite it); they write cfg_<mode>.yaml instead."""
    import geot_tpu.engine.train as T

    monkeypatch.setattr(T, "main", lambda cfg: {})
    monkeypatch.chdir(tmp_path)
    smoke = os.path.join(os.path.dirname(__file__), "..", "cfgs",
                         "tooth_semi", "smoke.yaml")
    captured = {}
    monkeypatch.setattr(T, "main",
                        lambda cfg: captured.update(cfg=cfg) or {})
    T.parse_and_run(["--cfg", smoke, "seed=5"])
    run_dir = captured["cfg"].run_dir
    original = open(os.path.join(run_dir, "cfg.yaml")).read()
    ckpt = os.path.join(captured["cfg"].ckpt_dir, "exp_ckpt_latest")
    os.makedirs(ckpt, exist_ok=True)

    T.parse_and_run(["--cfg", smoke, "mode=test", "lr=9.0",
                     f"pretrained_path={ckpt}"])
    assert (os.path.abspath(captured["cfg"].run_dir)
            == os.path.abspath(run_dir))           # reused, not regenerated
    assert open(os.path.join(run_dir, "cfg.yaml")).read() == original
    assert os.path.exists(os.path.join(run_dir, "cfg_test.yaml"))
