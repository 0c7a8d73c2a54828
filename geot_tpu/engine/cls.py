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

import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import cal_model_parm_nums
from ..core.random import set_random_seed
from ..data import build_dataloader_from_cfg
from ..models import build_model_from_cfg
from ..optim import build_optimizer_from_cfg, build_scheduler_from_cfg
from .checkpoint import save_checkpoint
from .state import TrainState
from .steps import make_eval_step, make_supervised_step
from .writer import SummaryWriter

logger = logging.getLogger("geot_tpu")


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
    from ..core.logger import setup_logger_dist
    setup_logger_dist(cfg.get("log_path"), jax.process_index(),
                      name="geot_tpu")
    set_random_seed(int(cfg.get("seed", 0)))
    run_dir = cfg.get("run_dir")
    writer = SummaryWriter(run_dir) if run_dir else None

    train_loader = build_dataloader_from_cfg(
        int(cfg.get("batch_size", 32)), cfg.dataset, cfg.get("dataloader"),
        cfg.get("datatransforms"), split=cfg.dataset.get("train_split", "train"),
        seed=int(cfg.get("seed", 0)))
    val_loader = build_dataloader_from_cfg(
        int(cfg.get("batch_size_val", cfg.get("batch_size", 32))),
        cfg.dataset, cfg.get("dataloader"), cfg.get("datatransforms"),
        split=cfg.dataset.get("val_split", "test"))
    logger.info(f"cls datasets: train={len(train_loader.dataset)} "
                f"val={len(val_loader.dataset)}")

    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    sample = _batch(next(iter(train_loader)), jax.device_put)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, sample)
    logger.info(f"model params: "
                f"{cal_model_parm_nums(variables['params']) / 1e6:.3f} M")

    tx = build_optimizer_from_cfg(None, lr=float(cfg.lr), **cfg.optimizer)
    schedule = build_scheduler_from_cfg(cfg)
    state = TrainState.create(variables, tx, ema=bool(cfg.get("ema_eval")))
    train_step = make_supervised_step(model, tx, cfg)
    eval_step = make_eval_step(model)

    mode = str(cfg.get("mode") or "train")
    if mode in ("val", "test", "eval", "testing", "evaluation"):
        from .checkpoint import load_variables
        pretrained = cfg.get("pretrained_path")
        if pretrained:
            variables = load_variables(pretrained)
        metrics = evaluate(eval_step, variables, val_loader, cfg)
        logger.info(f"eval: OA {metrics['oa']:.2f} mAcc {metrics['macc']:.2f}")
        return metrics

    val_freq = int(cfg.get("val_freq", 1) or 1)
    best = {"oa": 0.0, "macc": 0.0, "epoch": 0}
    start_epoch = 1
    if mode == "resume":
        # full-state restore + epoch counter (same semantics as the tooth
        # driver; reference ``resume_checkpoint``, ``ckpt_util.py:111``)
        pretrained = cfg.get("pretrained_path")
        if not (pretrained and os.path.isdir(str(pretrained))):
            raise FileNotFoundError(
                f"mode=resume requires pretrained_path pointing at a "
                f"checkpoint directory; got {pretrained!r}")
        from .checkpoint import load_checkpoint
        state, ckpt_epoch, extra = load_checkpoint(pretrained, state)
        start_epoch = int(ckpt_epoch) + 1
        best.update((extra or {}).get("best", {}))
        logger.info(f"resumed from {pretrained} at epoch {ckpt_epoch}")
    put = jax.device_put
    for epoch in range(start_epoch, int(cfg.epochs) + 1):
        train_loader.set_epoch(epoch)
        lr = jnp.asarray(schedule(epoch), jnp.float32)
        loss_sum, nb, t0 = None, 0, time.time()
        for batch in train_loader:
            state, metrics = train_step(state, _batch(batch, put), lr)
            loss_sum = metrics["loss"] if loss_sum is None \
                else loss_sum + metrics["loss"]
            nb += 1
        loss = float(loss_sum) / max(nb, 1)
        logger.info(f"epoch {epoch} loss {loss:.4f} "
                    f"lr {float(lr):.2e} ({time.time() - t0:.1f}s)")
        if writer:
            writer.add_scalar("train/loss", loss, epoch)
            writer.add_scalar("train/lr", float(lr), epoch)
        if epoch % val_freq == 0 or epoch == int(cfg.epochs):
            m = evaluate(eval_step, state.eval_variables, val_loader, cfg)
            is_best = m["oa"] > best["oa"]
            if is_best:
                best = {**m, "epoch": epoch}
            logger.info(f"epoch {epoch} val OA {m['oa']:.2f} "
                        f"mAcc {m['macc']:.2f}" + (" (best)" if is_best else ""))
            if writer:
                writer.add_scalar("val/oa", m["oa"], epoch)
                writer.add_scalar("val/macc", m["macc"], epoch)
            if run_dir:
                save_checkpoint(cfg, state, epoch,
                                additional_dict={"best": best},
                                is_best=is_best,
                                save_freq=cfg.get("save_freq"))
    logger.info(f"best: OA {best['oa']:.2f} mAcc {best['macc']:.2f} "
                f"(epoch {best['epoch']})")
    return {"best": best}
