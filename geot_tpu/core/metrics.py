"""Metric utilities (reference: ``openpoints/utils/metrics.py`` and the
per-tooth IoU/DSC/ACC computed inline in ``examples/segmentation/train.py:802``).
"""
from __future__ import annotations

import numpy as np


class AverageMeter:
    """Running average (reference: ``openpoints/utils/metrics.py:33``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class ConfusionMatrix:
    """Accumulating confusion matrix with mIoU / mAcc / OA
    (reference: ``openpoints/utils/metrics.py:51-167``)."""

    def __init__(self, num_classes: int, ignore_index: int | None = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.tp = np.zeros(num_classes, dtype=np.int64)
        self.union = np.zeros(num_classes, dtype=np.int64)
        self.count = np.zeros(num_classes, dtype=np.int64)
        self.total = 0

    def reset(self):
        self.tp[:] = 0
        self.union[:] = 0
        self.count[:] = 0
        self.total = 0

    def update(self, pred, true):
        pred = np.asarray(pred).reshape(-1)
        true = np.asarray(true).reshape(-1)
        if self.ignore_index is not None:
            keep = true != self.ignore_index
            pred, true = pred[keep], true[keep]
        self.total += true.size
        for c in range(self.num_classes):
            pc = pred == c
            tc = true == c
            inter = int(np.logical_and(pc, tc).sum())
            self.tp[c] += inter
            self.union[c] += int(pc.sum()) + int(tc.sum()) - inter
            self.count[c] += int(tc.sum())

    @property
    def overall_accuracy(self) -> float:
        return float(self.tp.sum()) / max(self.total, 1)

    def all_metrics(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            ious = np.where(self.union > 0, self.tp / np.maximum(self.union, 1), np.nan)
            accs = np.where(self.count > 0, self.tp / np.maximum(self.count, 1), np.nan)
        miou = float(np.nanmean(ious)) * 100.0
        macc = float(np.nanmean(accs)) * 100.0
        oa = self.overall_accuracy * 100.0
        return oa, macc, miou, ious * 100.0, accs * 100.0


def get_mious(tp, union, count):
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / np.maximum(union, 1)
        acc = tp / np.maximum(count, 1)
    return float(np.nanmean(iou)) * 100, float(np.nanmean(acc)) * 100, iou * 100, acc * 100


def seg_metrics_whole(pred: np.ndarray, label: np.ndarray):
    """Per-scan tooth metrics over a full-resolution scan, skipping the gum
    class 0 — mirrors ``get_seg_metrics`` (reference ``train.py:802-832``).

    IoU/DSC averaged over the classes present in the ground truth (class 0
    excluded); ACC over all points.  Returns (acc, miou, mdsc).
    """
    pred = np.asarray(pred).reshape(-1)
    label = np.asarray(label).reshape(-1)
    ious, dscs = [], []
    for c in np.unique(label):
        if c == 0:
            continue
        inter = np.logical_and(pred == c, label == c).sum()
        union = np.logical_or(pred == c, label == c).sum()
        iou = inter / union if union > 0 else 0.0
        ious.append(iou)
        dscs.append(2 * iou / (1 + iou))
    acc = float((pred == label).sum()) / label.size
    miou = float(np.mean(ious)) if ious else float("nan")
    mdsc = float(np.mean(dscs)) if dscs else float("nan")
    return acc, miou, mdsc
