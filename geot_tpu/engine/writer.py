"""Experiment observability.

Reference: torch ``SummaryWriter`` + wandb (``train.py:122``,
``openpoints/utils/wandb.py:30``).  Neither tensorboard nor wandb is available
in this image, so metrics are appended to ``scalars.jsonl`` in the run dir
(one ``{"tag", "value", "step", "ts"}`` line each — trivially greppable and
plottable), and the ``Wandb`` facade degrades to the same sink when the wandb
package is missing.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class SummaryWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self._path, "a", buffering=1)

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "ts": time.time()}) + "\n")

    def close(self):
        self._f.close()


class Wandb:
    """Facade matching ``openpoints/utils/wandb.py:30`` — real wandb when the
    package + login exist, silent no-op otherwise."""

    run = None

    @classmethod
    def launch(cls, cfg, use_wandb: bool = False):
        if not use_wandb:
            return None
        try:
            import wandb  # gated: not in this image

            cls.run = wandb.init(project=cfg.get("wandb", {}).get("project", "geot_tpu"),
                                 name=cfg.get("run_name"), config=dict(cfg))
        except Exception:
            cls.run = None
        return cls.run

    @classmethod
    def log(cls, data: dict, step: Optional[int] = None):
        if cls.run is not None:
            cls.run.log(data, step=step)
