"""ShapeNetPart part-segmentation driver.

The GeoT reference repo ships only the tooth driver
(``examples/segmentation/train.py``) but carries the full heritage part-seg
stack it inherited from openpoints: the ShapeNetPart datasets
(``openpoints/dataset/shapenetpart/shapenetpart.py``), ``BasePartSeg`` +
``PointNet2PartDecoder`` (``models/segmentation/base_seg.py:55``,
``models/backbone/pointnetv2.py:384``) and the instance-mIoU protocol
(``examples/segmentation/train.py:76-106`` ``get_ins_mious`` +
``part_seg_refinement``).  This driver closes the loop TPU-side: any
registered part-seg composition trains end-to-end through the same engine
pieces as the tooth drivers (donated :class:`TrainState`, jitted
``make_supervised_step``, optim/sched factories, orbax checkpoints).

Protocol (reference ``get_ins_mious`` consumption): per-shape instance mIoU
averaged over the split (``ins_miou``) and per-category means averaged over
the 16 categories (``cls_miou``).  ``eval_category_mask: true`` restricts the
argmax to the shape category's own parts (the classic pointnet2 protocol);
default false matches the reference's unmasked argmax.

Run: ``python -m geot_tpu.engine.train --cfg cfgs/shapenetpart/pointnet2part.yaml``
(the train CLI dispatches here on ``task: partseg``).
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
from ..data.shapenetpart import SHAPENETPART_CLS2PARTS
from ..models import build_model_from_cfg
from ..optim import build_optimizer_from_cfg, build_scheduler_from_cfg
from .checkpoint import save_checkpoint
from .partseg_eval import get_ins_mious, part_seg_refinement
from .state import TrainState
from .steps import make_eval_step, make_supervised_step
from .writer import SummaryWriter

logger = logging.getLogger("geot_tpu")


def _part_mask(num_parts: int = 50) -> np.ndarray:
    """(16, num_parts) membership mask from the category->parts table."""
    m = np.full((len(SHAPENETPART_CLS2PARTS), num_parts), -np.inf, np.float32)
    for c, parts in enumerate(SHAPENETPART_CLS2PARTS):
        m[c, parts] = 0.0
    return m


def _batch(batch, put):
    if isinstance(batch.get("pos"), list):
        # ragged full-resolution clouds can't share one jitted program; the
        # reference protocol evaluates at num_points anyway
        raise ValueError(
            "ragged part-seg batch (clouds shorter than num_points): set "
            "dataset presample: True or lower num_points for fixed shapes")
    keys = [k for k in ("pos", "x", "cls", "y") if k in batch]
    return put({k: batch[k] for k in keys})


def _cls_of(batch) -> np.ndarray:
    """Shape-category ids: the ``cls`` entry when the dataset emits one, else
    recovered from the h5 variant's per-point category one-hot features."""
    if "cls" in batch:
        return np.asarray(batch["cls"]).reshape(-1)
    return np.asarray(batch["x"])[:, 0, :16].argmax(-1)


def evaluate(eval_step, variables, loader, cfg) -> Dict[str, float]:
    """Instance/category mIoU over a split (reference protocol,
    ``examples/segmentation/train.py:76-106``).  Dispatch-then-fetch: all
    batches are dispatched before the first host fetch so device work
    pipelines with loading."""
    category_mask = bool(cfg.get("eval_category_mask", False))
    refine = bool(cfg.get("eval_refine", False))
    # multihead datasets emit per-category-offset labels (reference
    # ``shapenetpart.py`` multihead=True); get_ins_mious scores part indices
    # 0..len(parts)-1 then
    multihead = bool(dict(cfg.get("dataset", {}).get("common", {}))
                     .get("multihead", False)) if cfg.get("dataset") else False
    if multihead:
        # per-category-offset labels: the global-part-id mask/refinement
        # passes don't apply
        category_mask = refine = False
    mask = jnp.asarray(_part_mask(int(cfg.get("num_classes", 50))))
    pending = []                       # (pred_dev, cls_host, y_host, pos_host)
    for batch in loader:
        dev = _batch(batch, jax.device_put)
        cls_h = _cls_of(batch)
        logits = eval_step(variables, dev)
        if category_mask:
            logits = logits + mask[jnp.asarray(cls_h)][:, None, :]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pending.append((pred, cls_h,
                        np.asarray(batch["y"]), np.asarray(batch["pos"])))
    ins_mious, cats = [], []
    for pred, cls_h, y_h, pos_h in pending:
        p = np.asarray(pred)
        if refine:
            p = part_seg_refinement(p, pos_h, cls_h, SHAPENETPART_CLS2PARTS)
        ins_mious.extend(get_ins_mious(p, y_h, cls_h, SHAPENETPART_CLS2PARTS,
                                       multihead=multihead))
        cats.extend(cls_h.tolist())
    cats = np.asarray(cats)
    per_cat = {}
    for c in sorted(set(cats.tolist())):
        per_cat[int(c)] = float(np.mean(
            [m for m, cc in zip(ins_mious, cats) if cc == c]))
    return {
        "ins_miou": float(np.mean(ins_mious)),
        "cls_miou": float(np.mean(list(per_cat.values()))),
        "per_category": per_cat,
    }


def main(cfg):
    from ..core.logger import setup_logger_dist
    setup_logger_dist(cfg.get("log_path"), jax.process_index(),
                      name="geot_tpu")
    set_random_seed(int(cfg.get("seed", 0)))
    run_dir = cfg.get("run_dir")
    writer = SummaryWriter(run_dir) if run_dir else None

    train_loader = build_dataloader_from_cfg(
        int(cfg.get("batch_size", 8)), cfg.dataset, cfg.get("dataloader"),
        cfg.get("datatransforms"), split=cfg.dataset.get("train_split", "trainval"),
        seed=int(cfg.get("seed", 0)))
    val_loader = build_dataloader_from_cfg(
        int(cfg.get("batch_size_val", cfg.get("batch_size", 8))), cfg.dataset,
        cfg.get("dataloader"), cfg.get("datatransforms"),
        split=cfg.dataset.get("val_split", "test"))
    logger.info(f"partseg datasets: train={len(train_loader.dataset)} "
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
        logger.info(f"eval: ins_miou {metrics['ins_miou']:.2f} "
                    f"cls_miou {metrics['cls_miou']:.2f}")
        return metrics

    val_freq = int(cfg.get("val_freq", 1) or 1)
    best = {"ins_miou": 0.0, "cls_miou": 0.0, "epoch": 0}
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
            is_best = m["ins_miou"] > best["ins_miou"]
            if is_best:
                best = {**m, "epoch": epoch}
            logger.info(f"epoch {epoch} val ins_miou {m['ins_miou']:.2f} "
                        f"cls_miou {m['cls_miou']:.2f}"
                        + (" (best)" if is_best else ""))
            if writer:
                writer.add_scalar("val/ins_miou", m["ins_miou"], epoch)
                writer.add_scalar("val/cls_miou", m["cls_miou"], epoch)
            if run_dir:
                save_checkpoint(cfg, state, epoch,
                                additional_dict={"best": best},
                                is_best=is_best,
                                save_freq=cfg.get("save_freq"))
    logger.info(f"best: ins_miou {best['ins_miou']:.2f} "
                f"cls_miou {best['cls_miou']:.2f} (epoch {best['epoch']})")
    return {"best": best}
