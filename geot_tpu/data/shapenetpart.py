"""openpoints-heritage benchmark datasets
(reference: ``openpoints/dataset/shapenetpart/shapenetpart.py``,
``shapenet/shapenet55.py``, ``scanobjectnn/scanobjectnn.py``).

Each dataset reads its standard public distribution format when
``data_root`` exists and falls back to deterministic synthetic clouds
otherwise (same convention as the tooth datasets).
"""
from __future__ import annotations

import glob
import json
import os

import numpy as np

from .build import DATASETS

SHAPENETPART_CLS2PARTS = [
    [0, 1, 2, 3], [4, 5], [6, 7], [8, 9, 10, 11], [12, 13, 14, 15],
    [16, 17, 18], [19, 20, 21], [22, 23], [24, 25, 26, 27], [28, 29],
    [30, 31, 32, 33, 34, 35], [36, 37], [38, 39, 40], [41, 42, 43],
    [44, 45, 46], [47, 48, 49],
]


@DATASETS.register_module(name="ShapeNetPartNormal")
class ShapeNetPartNormal:
    """50-part segmentation over 16 categories with normals."""

    num_classes = 50
    shape_classes = 16
    cls2parts = SHAPENETPART_CLS2PARTS

    def __init__(self, data_root="", num_points=2048, split="train",
                 transform=None, use_normal=True, **kwargs):
        self.num_points = num_points
        self.split = split
        self.transform = transform
        self.use_normal = use_normal
        self.synthetic = not (data_root and os.path.isdir(data_root))
        if self.synthetic:
            self.items = list(range(32))
        else:
            split_file = os.path.join(
                data_root, "train_test_split",
                f"shuffled_{'val' if split == 'val' else split}_file_list.json")
            with open(split_file) as f:
                files = json.load(f)
            self.items = [os.path.join(data_root, *f.split("/")[1:]) + ".txt"
                          for f in files]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        rng = np.random.default_rng()
        if self.synthetic:
            g = np.random.default_rng(idx)
            n = self.num_points
            pos = g.standard_normal((n, 3)).astype(np.float32)
            normals = g.standard_normal((n, 3)).astype(np.float32)
            cls = idx % 16
            parts = self.cls2parts[cls]
            y = g.choice(parts, n).astype(np.int64)
        else:
            raw = np.loadtxt(self.items[idx]).astype(np.float32)
            sel = rng.choice(len(raw), self.num_points,
                             replace=len(raw) < self.num_points)
            raw = raw[sel]
            pos, normals, y = raw[:, :3], raw[:, 3:6], raw[:, 6].astype(np.int64)
            cls = int(y.min() // 4)  # category recoverable from part range
        data = {"pos": pos, "y": y,
                "cls": np.asarray([cls], dtype=np.int64)}
        data["x"] = np.concatenate([pos, normals], axis=-1) if self.use_normal else pos
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


@DATASETS.register_module(name="ShapeNet55")
class ShapeNet55:
    """Whole-shape point clouds for generative pretraining."""

    def __init__(self, data_root="", num_points=1024, split="train",
                 transform=None, **kwargs):
        self.num_points = num_points
        self.transform = transform
        self.synthetic = not (data_root and os.path.isdir(data_root))
        self.items = (list(range(64)) if self.synthetic else
                      sorted(glob.glob(os.path.join(data_root, split, "*.npy"))))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        rng = np.random.default_rng()
        if self.synthetic:
            pos = np.random.default_rng(idx).standard_normal(
                (self.num_points, 3)).astype(np.float32)
        else:
            pts = np.load(self.items[idx]).astype(np.float32)
            sel = rng.choice(len(pts), self.num_points,
                             replace=len(pts) < self.num_points)
            pos = pts[sel, :3]
        data = {"pos": pos, "x": pos, "y": np.int64(idx % 55)}
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


@DATASETS.register_module(name="ScanObjectNN")
class ScanObjectNN:
    """Real-scan object classification (hardest variant surface)."""

    num_classes = 15

    def __init__(self, data_root="", num_points=1024, split="train",
                 transform=None, **kwargs):
        self.num_points = num_points
        self.transform = transform
        self.synthetic = not (data_root and os.path.isdir(data_root))
        if self.synthetic:
            self.pos = None
            self.items = list(range(64))
        else:
            import h5py  # gated: only needed with real data

            name = "training" if split == "train" else "test"
            h5 = h5py.File(os.path.join(
                data_root, f"{name}_objectdataset_augmentedrot_scale75.h5"), "r")
            self.pos = np.asarray(h5["data"]).astype(np.float32)
            self.label = np.asarray(h5["label"]).astype(np.int64)
            self.items = list(range(len(self.pos)))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        rng = np.random.default_rng()
        if self.pos is None:
            pos = np.random.default_rng(idx).standard_normal(
                (self.num_points, 3)).astype(np.float32)
            y = np.int64(idx % self.num_classes)
        else:
            pts = self.pos[idx]
            sel = rng.choice(len(pts), self.num_points,
                             replace=len(pts) < self.num_points)
            pos, y = pts[sel], self.label[idx]
        data = {"pos": pos, "x": pos, "y": y}
        if self.transform is not None:
            data = self.transform(data, rng)
        return data
