"""Epoch-by-epoch LR parity of the scheduler factory against the reference's
vendored timm schedulers (loaded as test-time oracles with a dummy torch
optimizer; skipped when /root/reference is absent)."""
import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/openpoints/scheduler"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

from geot_tpu.core.config import EasyConfig  # noqa: E402
from geot_tpu.optim import build_scheduler_from_cfg  # noqa: E402


def _ref_factory():
    # the reference files absolute-import ``openpoints.scheduler.scheduler``;
    # register stub packages routing that name to the reference directory
    # WITHOUT importing the real openpoints/__init__ (which pulls CUDA deps)
    if "openpoints.scheduler" not in sys.modules:
        op = types.ModuleType("openpoints")
        op.__path__ = []
        sched = types.ModuleType("openpoints.scheduler")
        sched.__path__ = [REF]
        op.scheduler = sched
        sys.modules["openpoints"] = op
        sys.modules["openpoints.scheduler"] = sched
    return importlib.import_module("openpoints.scheduler.scheduler_factory")


def _ref_lrs(cfg: dict):
    mod = _ref_factory()
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=cfg["lr"])

    class A:
        pass

    args = A()
    for k, v in cfg.items():
        setattr(args, k, v)
    sched = mod.build_scheduler_from_cfg(args, opt)
    lrs = []
    for epoch in range(cfg["epochs"]):
        sched.step(epoch)                      # reference train.py:333-338
        lrs.append(opt.param_groups[0]["lr"])
    return np.asarray(lrs)


def _our_lrs(cfg: dict):
    schedule = build_scheduler_from_cfg(EasyConfig(dict(cfg)))
    # engine/train.py evaluates the schedule at epoch (1-based) each epoch;
    # the reference calls sched.step(epoch) with 0-based epoch before the
    # epoch runs — align on the reference's convention here
    return np.asarray([float(schedule(e + 1)) for e in range(cfg["epochs"])])


CASES = [
    {"sched": "multistep", "lr": 1e-3, "epochs": 30, "decay_epochs": [20, 25],
     "decay_rate": 0.1, "warmup_epochs": 0},
    {"sched": "cosine", "lr": 1e-3, "epochs": 30, "warmup_epochs": 0,
     "min_lr": 1e-5, "t_max": 30, "decay_rate": 0.1},
    {"sched": "cosine", "lr": 1e-3, "epochs": 30, "warmup_epochs": 5,
     "warmup_lr": 1e-6, "min_lr": 1e-5, "t_max": 30, "decay_rate": 0.1},
    {"sched": "step", "lr": 1e-3, "epochs": 30, "decay_epochs": 10,
     "decay_rate": 0.5, "warmup_epochs": 0},
]


@pytest.mark.parametrize("cfg", CASES,
                         ids=[f"{c['sched']}-w{c['warmup_epochs']}"
                              for c in CASES])
def test_schedule_matches_reference(cfg):
    ref = _ref_lrs(dict(cfg))
    ours = _our_lrs(dict(cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-12)
