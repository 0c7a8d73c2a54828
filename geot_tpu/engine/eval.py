"""Full-resolution validation.

Reference ``validate``/``get_pred_whole``/``get_seg_metrics``
(``examples/segmentation/train.py:716-832``): predict on the 16k sample,
denormalise, three_nn + inverse-distance-interpolate the logits to the full
scan, then per-class IoU/DSC/ACC (gum class 0 excluded) split by jaw.

Full scans are ragged; each is padded to a bucket size (multiple of
``bucket``) so jit compiles once per bucket, and padded points are masked out
of the metrics.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import seg_metrics_whole
from ..ops import three_nn


@jax.jit
def _upsample_pred(probs, pos, full_points, center, scale):
    """probs (N, C) softmax; pos (N, 3) normalised sample; full (P, 3) raw.
    Returns argmax predictions (P,) on the full scan."""
    pos_world = pos * scale + center
    dist, idx = three_nn(full_points[None], pos_world[None])
    dist, idx = dist[0], idx[0]
    recip = 1.0 / (dist + 1e-8)
    weight = recip / jnp.sum(recip, axis=1, keepdims=True)
    gathered = probs[idx]                                    # (P, 3, C)
    logit_whole = jnp.sum(gathered * weight[..., None], axis=1)
    return jnp.argmax(logit_whole, axis=-1)


def get_pred_whole(logits, pos, full_points_list, centers, scales,
                   bucket: int = 8192) -> List[np.ndarray]:
    """Per-sample full-resolution predictions (reference ``train.py:781-800``).

    logits (B, N, C) raw; full_points_list: list of (P_i, 3) numpy arrays.
    """
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    preds = []
    for i, full in enumerate(full_points_list):
        full = np.asarray(full, dtype=np.float32)
        P = len(full)
        padded_len = -(-P // bucket) * bucket
        padded = np.zeros((padded_len, 3), dtype=np.float32)
        padded[:P] = full
        pred = _upsample_pred(probs[i], jnp.asarray(pos[i]),
                              jnp.asarray(padded),
                              jnp.asarray(np.asarray(centers[i], dtype=np.float32)),
                              jnp.asarray(np.float32(scales[i])))
        preds.append(np.asarray(pred)[:P])
    return preds


def validate(eval_step, variables, val_loader, cfg, logger=None,
             num_votes: int = 0, data_transform=None) -> Dict[str, float]:
    """Reference ``validate`` (``train.py:716-779``): whole-scan metrics split
    into mandible (cls 0) / maxillary (cls 1) / whole means.

    ``num_votes > 0``: average softmax over additional augmented passes using
    the ``vote`` transform pipeline (reference ``train.py:365-375``)."""
    mandible = {"miou": [], "dsc": [], "acc": []}
    maxillary = {"miou": [], "dsc": [], "acc": []}
    sampled_accs = []
    vote_rng = np.random.default_rng(int(cfg.get("seed", 0)) if cfg else 0)
    for batch in val_loader:
        model_batch = {"pos": jnp.asarray(batch["pos"]),
                       "x": jnp.asarray(batch["x"]),
                       "cls": jnp.asarray(batch["cls"])}
        logits = eval_step(variables, model_batch)
        if num_votes and data_transform is not None:
            probs = jax.nn.softmax(logits, axis=-1)
            for _ in range(num_votes):
                voted = {"pos": np.asarray(batch["pos"]).copy()}
                voted = data_transform(voted, vote_rng)
                vb = dict(model_batch)
                vb["pos"] = jnp.asarray(voted["pos"])
                vb["x"] = vb["pos"]
                probs = probs + jax.nn.softmax(eval_step(variables, vb), axis=-1)
            logits = jnp.log(probs / (num_votes + 1) + 1e-12)
        # direct accuracy on the sampled points — separates model quality
        # from the full-res upsampling path
        sampled_accs.append(float(np.mean(
            np.asarray(jnp.argmax(logits, -1)) == np.asarray(batch["y"]))))
        preds = get_pred_whole(logits, batch["pos"], batch["points"],
                               batch["center"], batch["scale"])
        for i, pred in enumerate(preds):
            acc, miou, mdsc = seg_metrics_whole(pred, np.asarray(batch["labels"][i]))
            side = mandible if int(np.asarray(batch["cls"][i]).reshape(-1)[0]) == 0 \
                else maxillary
            side["miou"].append(miou)
            side["dsc"].append(mdsc)
            side["acc"].append(acc)

    def _mean(vals):
        return float(np.mean(vals)) if vals else float("nan")

    out = {}
    for name, side in (("mandible", mandible), ("maxillary", maxillary)):
        for k in ("miou", "dsc", "acc"):
            out[f"{name}_{k}"] = _mean(side[k])
    n = len(mandible["miou"]) + len(maxillary["miou"])
    for k in ("miou", "dsc", "acc"):
        total = sum(mandible[k]) + sum(maxillary[k])
        out[f"whole_{k}"] = total / n if n else float("nan")
    out["sampled_acc"] = _mean(sampled_accs)
    if logger is not None:
        logger.info("val: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
    return out
