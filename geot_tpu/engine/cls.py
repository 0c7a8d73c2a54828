"""Point-cloud classification driver (``task: cls``).

The reference repo carries the classification stack it inherited from
openpoints — ``BaseCls``/``ClsHead``/``DistillCls``
(``models/classification/cls_base.py``), every backbone's
``forward_cls_feat`` and the ScanObjectNN / ShapeNet55 datasets
(``dataset/scanobjectnn/``, ``dataset/shapenet55/``) — but only ships the
tooth segmentation driver.  This driver trains any registered cls
composition end-to-end through the same engine pieces (donated
:class:`TrainState`, jitted ``make_supervised_step``, optim/sched factories,
orbax checkpoints).

Protocol (openpoints classification convention): overall accuracy (OA) and
mean per-class accuracy (mAcc) on the val split; best checkpoint by OA.

Run: ``python -m geot_tpu.engine.train --cfg cfgs/scanobjectnn/pointnet2cls.yaml``
(the train CLI dispatches here on ``task: cls``).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _batch(batch, put):
    return put({k: batch[k] for k in ("pos", "x", "y") if k in batch})


def evaluate(eval_step, variables, loader, cfg) -> Dict[str, float]:
    """OA + mAcc over a split.  Dispatch-then-fetch: all device programs are
    issued before the first host sync so forward passes pipeline with
    loading."""
    num_classes = int(cfg.get("num_classes", 15))
    pending = []
    for batch in loader:
        logits = eval_step(variables, _batch(batch, jax.device_put))
        pending.append((jnp.argmax(logits, -1), np.asarray(batch["y"])))
    correct = np.zeros(num_classes, np.int64)
    seen = np.zeros(num_classes, np.int64)
    for pred, y in pending:
        p = np.asarray(pred).reshape(-1)
        y = y.reshape(-1)
        np.add.at(seen, y, 1)
        np.add.at(correct, y[p == y], 1)
    oa = float(correct.sum()) / max(int(seen.sum()), 1)
    present = seen > 0
    macc = float(np.mean(correct[present] / seen[present])) if present.any() \
        else 0.0
    return {"oa": 100.0 * oa, "macc": 100.0 * macc}


def main(cfg):
    from .taskloop import run
    return run(cfg, task="cls", batch_fn=_batch, evaluate_fn=evaluate,
               primary="oa", metric_names=("oa", "macc"))
