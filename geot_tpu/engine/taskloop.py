"""Shared supervised task loop for the heritage drivers.

``partseg`` and ``cls`` (and any future single-state supervised task) differ
only in their batch keys and evaluation protocol; everything else — loaders,
model init, optimizer/schedule, resume, the epoch loop, checkpointing — is
this one loop over the engine pieces (donated :class:`TrainState`, jitted
``make_supervised_step``, orbax best/latest checkpoints)."""
from __future__ import annotations

import logging
import os
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

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


def run(cfg, *, task: str, batch_fn: Callable, evaluate_fn: Callable,
        primary: str, metric_names: Sequence[str],
        default_train_split: str = "train", default_val_split: str = "test"):
    """Train (or eval) one supervised task.

    ``evaluate_fn(eval_step, variables, loader, cfg) -> dict`` scores a
    split; ``primary`` is the metric that selects the best checkpoint;
    ``metric_names`` are logged/written per validation."""
    from ..core.logger import setup_logger_dist
    setup_logger_dist(cfg.get("log_path"), jax.process_index(),
                      name="geot_tpu")
    set_random_seed(int(cfg.get("seed", 0)))
    run_dir = cfg.get("run_dir")
    writer = SummaryWriter(run_dir) if run_dir else None

    # the configured training split IS a training split regardless of its
    # name (e.g. ShapeNetPart's 'trainval'): shuffle/drop_last/train
    # transforms follow the role, not the split string
    train_loader = build_dataloader_from_cfg(
        int(cfg.get("batch_size", 8)), cfg.dataset, cfg.get("dataloader"),
        cfg.get("datatransforms"),
        split=cfg.dataset.get("train_split", default_train_split),
        seed=int(cfg.get("seed", 0)), is_train=True)
    val_loader = build_dataloader_from_cfg(
        int(cfg.get("batch_size_val", cfg.get("batch_size", 8))),
        cfg.dataset, cfg.get("dataloader"), cfg.get("datatransforms"),
        split=cfg.dataset.get("val_split", default_val_split),
        is_train=False)
    logger.info(f"{task} datasets: train={len(train_loader.dataset)} "
                f"val={len(val_loader.dataset)}")

    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    sample = batch_fn(next(iter(train_loader)), jax.device_put)
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
        if not pretrained:
            # scoring a freshly initialized model would produce
            # legitimate-looking metrics from random weights — refuse, like
            # the mode=resume branch does
            raise FileNotFoundError(
                f"mode={mode} requires pretrained_path pointing at a "
                f"checkpoint; got {pretrained!r}")
        variables = load_variables(pretrained)
        metrics = evaluate_fn(eval_step, variables, val_loader, cfg)
        logger.info("eval: " + " ".join(
            f"{k} {metrics[k]:.2f}" for k in metric_names))
        return metrics

    val_freq = int(cfg.get("val_freq", 1) or 1)
    best = {k: 0.0 for k in metric_names}
    best["epoch"] = 0
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
            state, metrics = train_step(state, batch_fn(batch, put), lr)
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
            m = evaluate_fn(eval_step, state.eval_variables, val_loader, cfg)
            is_best = m[primary] > best[primary]
            if is_best:
                best = {**m, "epoch": epoch}
            logger.info(f"epoch {epoch} val " + " ".join(
                f"{k} {m[k]:.2f}" for k in metric_names)
                + (" (best)" if is_best else ""))
            if writer:
                for k in metric_names:
                    writer.add_scalar(f"val/{k}", m[k], epoch)
            if run_dir:
                save_checkpoint(cfg, state, epoch,
                                additional_dict={"best": best},
                                is_best=is_best,
                                save_freq=cfg.get("save_freq"))
    logger.info("best: " + " ".join(
        f"{k} {best[k]:.2f}" for k in metric_names)
        + f" (epoch {best['epoch']})")
    return {"best": best}
