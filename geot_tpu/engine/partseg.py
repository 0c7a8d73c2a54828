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

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.shapenetpart import SHAPENETPART_CLS2PARTS
from .partseg_eval import get_ins_mious, part_seg_refinement


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
    # 0..len(parts)-1 then.  Merge common with the val-split cfg — same
    # precedence as build_dataloader_from_cfg — so a per-split setting
    # (dataset.test.multihead) is honoured.
    multihead = False
    if cfg.get("dataset"):
        ds = cfg.get("dataset", {})
        merged = dict(ds.get("common", {}))
        merged.update(dict(ds.get(ds.get("val_split", "test"), {}) or {}))
        multihead = bool(merged.get("multihead", False))
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
    from .taskloop import run
    return run(cfg, task="partseg", batch_fn=_batch, evaluate_fn=evaluate,
               primary="ins_miou", metric_names=("ins_miou", "cls_miou"),
               default_train_split="trainval")
