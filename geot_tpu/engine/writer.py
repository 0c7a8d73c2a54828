"""Experiment observability.

Reference: torch ``SummaryWriter`` + wandb (``train.py:122``,
``openpoints/utils/wandb.py:30``).  Scalars always go to ``scalars.jsonl`` in
the run dir (one ``{"tag", "value", "step", "ts"}`` line each — greppable and
plottable with nothing installed); when a TensorBoard writer is importable
(tensorboardX or torch.utils.tensorboard, both in this image) real event
files are ALSO written under ``<run_dir>/tb``.  The ``Wandb`` facade becomes
real wandb when the package + login exist, and degrades to a no-op otherwise.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


def _make_tb(log_dir: str):
    tb_dir = os.path.join(log_dir, "tb")
    try:
        from tensorboardX import SummaryWriter as TBWriter

        return TBWriter(logdir=tb_dir)
    except Exception:  # noqa: BLE001
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter as TBWriter

        return TBWriter(log_dir=tb_dir)
    except Exception:  # noqa: BLE001
        return None


class SummaryWriter:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self._path, "a", buffering=1)
        self._tb = _make_tb(log_dir) if tensorboard else None

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "ts": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def git_state(cwd: str | None = None) -> dict:
    """Commit sha + working-tree diff of the code being run (reference
    ``Wandb.launch``, ``openpoints/utils/wandb.py:61-71``)."""
    import subprocess

    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=cwd,
            stderr=subprocess.DEVNULL).decode("ascii").strip()
        diff = subprocess.check_output(
            ["git", "diff"], cwd=cwd, stderr=subprocess.DEVNULL).decode()
    except Exception:
        sha, diff = "n/a", ""
    return {"commit": sha, "gitdiff": diff}


class Wandb:
    """Facade matching ``openpoints/utils/wandb.py:30`` — real wandb when the
    package + login exist, silent no-op otherwise.  Like the reference, the
    run config carries run_path + git sha/diff, and the experiment's cfg yaml
    is saved as a run file (``wandb.py:45-78``)."""

    run = None

    @classmethod
    def launch(cls, cfg, use_wandb: bool = False):
        if not use_wandb:
            return None
        config = {**dict(cfg), "run_path": os.getcwd(),
                  **git_state(os.path.dirname(os.path.abspath(__file__)))}
        try:
            import wandb  # gated: not in this image

            cls.run = wandb.init(project=cfg.get("wandb", {}).get("project", "geot_tpu"),
                                 name=cfg.get("run_name"), config=config,
                                 resume="allow", sync_tensorboard=True)
            cfg_yaml = os.path.join(cfg["run_dir"], "cfg.yaml") \
                if cfg.get("run_dir") else None
            if cfg_yaml and os.path.exists(cfg_yaml):
                wandb.save(cfg_yaml)
        except Exception:
            cls.run = None
        return cls.run

    @classmethod
    def log(cls, data: dict, step: Optional[int] = None):
        if cls.run is not None:
            cls.run.log(data, step=step)
