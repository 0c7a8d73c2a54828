"""Experiment directories + rank-aware logging
(reference: ``openpoints/utils/logger.py:36,104,140``)."""
from __future__ import annotations

import logging
import os
import sys
import time
import uuid
from pathlib import Path


def setup_logger_dist(log_path: str | None = None, rank: int = 0, name: str = "geot"):
    """Rank-0 logs to stdout + optional file; other ranks log warnings only."""
    root = logging.getLogger()
    root.handlers.clear()
    level = logging.INFO if rank == 0 else logging.WARNING
    root.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s",
        datefmt="%m/%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if log_path and rank == 0:
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        fh = logging.FileHandler(log_path)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root


def _short_uuid() -> str:
    return uuid.uuid4().hex[:8]


def generate_exp_directory(cfg, tags=None, additional_id=None):
    """Create ``run_dir = root_dir/<tag-joined name>-<timestamp>-<uuid>`` with
    ``checkpoint/`` subdir; records run_name/run_dir/ckpt_dir/log_path in cfg.
    Mirrors ``openpoints/utils/logger.py:104``."""
    tags = tags or ["exp"]
    run_name = "-".join([str(t) for t in tags if str(t)])
    stamp = time.strftime("%Y%m%d-%H%M%S")
    run_name = f"{run_name}-{stamp}-{_short_uuid()}"
    if additional_id is not None:
        run_name += f"-{additional_id}"
    cfg.run_name = run_name
    cfg.run_dir = os.path.join(cfg.get("root_dir", "./log"), run_name)
    cfg.ckpt_dir = os.path.join(cfg.run_dir, "checkpoint")
    cfg.log_dir = cfg.run_dir
    cfg.log_path = os.path.join(cfg.run_dir, f"{run_name}.log")
    Path(cfg.ckpt_dir).mkdir(parents=True, exist_ok=True)
    return cfg.run_dir


def resume_exp_directory(cfg, pretrained_path=None):
    """Recover run dirs from an existing checkpoint path
    (reference: ``openpoints/utils/logger.py:140``)."""
    if pretrained_path and os.path.exists(pretrained_path):
        ckpt_dir = os.path.dirname(os.path.abspath(pretrained_path))
        cfg.run_dir = os.path.dirname(ckpt_dir)
        cfg.ckpt_dir = ckpt_dir
        cfg.run_name = os.path.basename(cfg.run_dir)
    else:
        generate_exp_directory(cfg, tags=[cfg.get("mode", "resume")])
    cfg.log_dir = cfg.run_dir
    cfg.log_path = os.path.join(cfg.run_dir, f"{cfg.run_name}-{cfg.get('mode', 'resume')}.log")
    Path(cfg.run_dir).mkdir(parents=True, exist_ok=True)
    return cfg.run_dir
