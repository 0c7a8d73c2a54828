"""ShapeNetPart-style evaluation utilities.

Reference: ``examples/segmentation/train.py:50-106`` — ``batched_bincount``,
``part_seg_refinement`` (kNN-vote label refinement for tiny/invalid part
islands) and ``get_ins_mious`` (shape IoU).
"""
from __future__ import annotations

from collections import Counter
from typing import List, Sequence

import numpy as np

from ..ops import knn


def batched_bincount(x: np.ndarray, max_value: int) -> np.ndarray:
    """(B, K) int -> (B, max_value) counts (reference ``train.py:50-54``)."""
    out = np.zeros((x.shape[0], max_value), dtype=np.int64)
    for i, row in enumerate(np.asarray(x)):
        out[i] = np.bincount(row, minlength=max_value)[:max_value]
    return out


def part_seg_refinement(pred: np.ndarray, pos: np.ndarray, cls: np.ndarray,
                        cls2parts: Sequence[Sequence[int]], n: int = 10):
    """kNN majority-vote refinement of part labels that are invalid for the
    shape category or form islands smaller than ``n``
    (reference ``train.py:57-73``)."""
    import jax.numpy as jnp

    pred = np.asarray(pred).copy()
    pos = np.asarray(pos)
    max_part = cls2parts[-1][-1] + 1
    for b in range(pred.shape[0]):
        parts = set(cls2parts[int(np.asarray(cls[b]).reshape(-1)[0])])
        counts = Counter(pred[b].tolist())
        if len(counts) <= 1:
            continue
        for part_id, cnt in list(counts.items()):
            if cnt < n or part_id not in parts:
                bad = np.where(pred[b] == part_id)[0]
                _, idx = knn(jnp.asarray(pos[b][bad][None]),
                             jnp.asarray(pos[b][None]), n + 1)
                neigh = pred[b][np.asarray(idx)[0]]            # (bad, n+1)
                hist = batched_bincount(neigh, max_part)
                hist[:, part_id] = 0
                pred[b][bad] = hist.argmax(axis=1)
    return pred


def get_ins_mious(pred, target, cls, cls2parts,
                  multihead: bool = False) -> List[float]:
    """Shape IoU: mean part IoU per shape (reference ``train.py:76-106``)."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    ins_mious = []
    for b in range(pred.shape[0]):
        parts = cls2parts[int(np.asarray(cls[b]).reshape(-1)[0])]
        if multihead:
            parts = list(range(len(parts)))
        part_ious = []
        for part in parts:
            p = pred[b] == part
            t = target[b] == part
            union = np.logical_or(p, t).sum()
            if union == 0:
                part_ious.append(100.0)
            else:
                part_ious.append(np.logical_and(p, t).sum() * 100.0 / union)
        ins_mious.append(float(np.mean(part_ious)))
    return ins_mious
