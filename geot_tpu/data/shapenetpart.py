"""openpoints-heritage benchmark datasets
(reference: ``openpoints/dataset/shapenetpart/shapenetpart.py``,
``shapenet/shapenet55.py``, ``scanobjectnn/scanobjectnn.py``).

Behavioural ports of the five reference registry entries — ``ShapeNetPart``
(h5, category-one-hot features + trainval translate/shuffle augmentation),
``ShapeNetPartNormal`` (txt, normals features, ``class_choice``/``multihead``/
``presample``-with-FPS options), ``ShapeNetPartCurve`` (h5, CurveNet payload),
``ShapeNet`` (multi-view render pretraining over ShapeNet55, the shapenet
sibling of ``tooth_6000``) and ``ScanObjectNN`` (objectbg/objectonly/hardest
modes, height feature channel).  Each reads its standard public distribution
when ``data_root`` exists and falls back to deterministic synthetic clouds
otherwise (same convention as the tooth datasets) so the full surface runs in
CI without the archives.
"""
from __future__ import annotations

import glob
import json
import os
import pickle

import numpy as np

from .build import DATASETS
from .data_util import EpochSeededRNG as _EpochSeeded
from .data_util import rotate_theta_phi

CLASSES16 = ['airplane', 'bag', 'cap', 'car', 'chair', 'earphone', 'guitar',
             'knife', 'lamp', 'laptop', 'motorbike', 'mug', 'pistol',
             'rocket', 'skateboard', 'table']
SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
PART_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]
SHAPENETPART_CLS2PARTS = [
    [0, 1, 2, 3], [4, 5], [6, 7], [8, 9, 10, 11], [12, 13, 14, 15],
    [16, 17, 18], [19, 20, 21], [22, 23], [24, 25, 26, 27], [28, 29],
    [30, 31, 32, 33, 34, 35], [36, 37], [38, 39, 40], [41, 42, 43],
    [44, 45, 46], [47, 48, 49],
]




def _cls2partembed():
    e = np.zeros((16, 50), np.float32)
    for i, parts in enumerate(SHAPENETPART_CLS2PARTS):
        e[i, parts] = 1.0
    return e


def _translate_pointcloud(pc, rng):
    """Anisotropic scale + shift (reference ``shapenetpart.py:52``)."""
    xyz1 = rng.uniform(2.0 / 3.0, 3.0 / 2.0, 3)
    xyz2 = rng.uniform(-0.2, 0.2, 3)
    return (pc * xyz1 + xyz2).astype(np.float32)


# reference-name module-level helpers (``shapenetpart.py:48-74``); the
# datasets themselves use the explicit-rng variants above for deterministic
# epoch-varying augmentation, but the public names stay importable
def translate_pointcloud(pointcloud, rng=None):
    return _translate_pointcloud(pointcloud, rng or np.random.default_rng())


def jitter_pointcloud(pointcloud, sigma=0.01, clip=0.02, rng=None):
    """Reference ``shapenetpart.py:61``."""
    rng = rng or np.random.default_rng()
    n, c = pointcloud.shape
    return pointcloud + np.clip(sigma * rng.standard_normal((n, c)),
                                -clip, clip).astype(pointcloud.dtype)


def rotate_pointcloud(pointcloud, rng=None):
    """Random rotation in the (x, z) plane (reference ``shapenetpart.py:67``)."""
    rng = rng or np.random.default_rng()
    theta = np.pi * 2 * rng.uniform()
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]], pointcloud.dtype)
    out = pointcloud.copy()
    out[:, [0, 2]] = out[:, [0, 2]] @ rot
    return out


def _synth_part(idx, num_points):
    g = np.random.default_rng(idx)
    pos = g.standard_normal((num_points, 3)).astype(np.float32)
    normals = g.standard_normal((num_points, 3)).astype(np.float32)
    cls = idx % 16
    y = g.choice(SHAPENETPART_CLS2PARTS[cls], num_points).astype(np.int64)
    return pos, normals, cls, y


def _load_h5_partseg(partition, data_root):
    """Concatenate the split's h5 shards (reference ``load_data_partseg``,
    ``shapenetpart.py:27``)."""
    import h5py  # gated: only needed with the real archive

    if partition == "trainval":
        files = (glob.glob(os.path.join(data_root, "*train*.h5"))
                 + glob.glob(os.path.join(data_root, "*val*.h5")))
    else:
        files = glob.glob(os.path.join(data_root, f"*{partition}*.h5"))
    data, label, seg = [], [], []
    for name in sorted(files):
        with h5py.File(name, "r") as f:
            data.append(np.asarray(f["data"], dtype=np.float32))
            label.append(np.asarray(f["label"], dtype=np.int64))
            seg.append(np.asarray(f["pid"], dtype=np.int64))
    return (np.concatenate(data), np.concatenate(label), np.concatenate(seg))


class _PartsegH5Base(_EpochSeeded):
    """Shared h5 machinery of ``ShapeNetPart``/``ShapeNetPartCurve``."""

    def __init__(self, data_root="", num_points=2048, split="train",
                 class_choice=None, shape_classes=16, transform=None,
                 **kwargs):
        self.num_points = num_points
        self.partition = split
        self.transform = transform
        self.seed = int(kwargs.get("seed", 0))
        self.eye = np.eye(shape_classes, dtype=np.float32)
        self.cat2id = {c if c != "motorbike" else "motor": i
                       for i, c in enumerate(CLASSES16)}
        self.seg_num, self.index_start = SEG_NUM, PART_START
        self.synthetic = not (data_root and os.path.isdir(data_root))
        if self.synthetic:
            self.data = self.label = self.seg = None
            self.n = 32
        else:
            self.data, self.label, self.seg = _load_h5_partseg(split, data_root)
            if class_choice is not None:
                cid = self.cat2id[class_choice]
                keep = (self.label == cid).squeeze()
                self.data, self.label, self.seg = \
                    self.data[keep], self.label[keep], self.seg[keep]
                self.seg_num_all = self.seg_num[cid]
                self.seg_start_index = self.index_start[cid]
            else:
                self.seg_num_all, self.seg_start_index = 50, 0
            self.n = len(self.data)

    def __len__(self):
        return self.n

    def _item(self, idx, rng):
        if self.synthetic:
            pos, _, cls, seg = _synth_part(idx, self.num_points)
            return pos, np.int64(cls), seg
        pos = self.data[idx][:self.num_points].copy()
        seg = self.seg[idx][:self.num_points].copy()
        return pos, self.label[idx].astype(np.int64), seg


@DATASETS.register_module(name="ShapeNetPart")
class ShapeNetPart(_PartsegH5Base):
    """h5 variant (reference ``shapenetpart.py:77``): features are the
    16-category one-hot broadcast per point; trainval split applies the
    translate + shuffle augmentation."""

    cls2parts = SHAPENETPART_CLS2PARTS

    def __getitem__(self, idx):
        rng = self._rng(idx)
        pos, cls, seg = self._item(idx, rng)
        if self.partition == "trainval":
            pos = _translate_pointcloud(pos, rng)
            order = rng.permutation(len(pos))
            pos, seg = pos[order], seg[order]
        onehot = self.eye[int(np.ravel(cls)[0])]
        feat = np.broadcast_to(onehot, (len(pos), len(onehot))).copy()
        data = {"pos": pos, "x": feat, "y": seg}
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


@DATASETS.register_module(name="ShapeNetPartCurve")
class ShapeNetPartCurve(_PartsegH5Base):
    """CurveNet payload (reference ``shapenetpart.py:375``): pos/cls/y, train
    shuffle, height feature only when a transform adds it."""

    cls2parts = SHAPENETPART_CLS2PARTS

    def __getitem__(self, idx):
        rng = self._rng(idx)
        pos, cls, seg = self._item(idx, rng)
        if "train" in self.partition:
            order = rng.permutation(len(pos))
            pos, seg = pos[order], seg[order]
        data = {"pos": pos, "cls": np.ravel(cls).astype(np.int64), "y": seg}
        if self.transform is not None:
            data = self.transform(data, rng)
        if "heights" in data:
            data["x"] = data["heights"]
        return data


@DATASETS.register_module(name="ShapeNetPartNormal")
class ShapeNetPartNormal(_EpochSeeded):
    """txt variant with per-point normals (reference ``shapenetpart.py:134``):
    ``class_choice`` filtering, ``multihead`` per-category label offsets and
    ``presample`` (FPS once, cached to ``processed/<split>_<n>_fps.pkl``)."""

    num_classes = 50
    shape_classes = 16
    classes = CLASSES16
    seg_num = SEG_NUM
    part_start = PART_START
    cls2parts = SHAPENETPART_CLS2PARTS
    cls2partembed = _cls2partembed()

    def __init__(self, data_root="", num_points=2048, split="train",
                 transform=None, use_normal=True, class_choice=None,
                 presample=False, multihead=False, **kwargs):
        self.num_points = num_points
        self.split = split
        self.transform = transform
        self.seed = int(kwargs.get("seed", 0))
        self.use_normal = use_normal
        self.multihead = multihead
        self.presample = presample
        self.synthetic = not (data_root and os.path.isdir(data_root))
        if self.synthetic:
            self.items = list(range(32))
            if class_choice is not None:
                cid = CLASSES16.index(class_choice)
                self.items = [i for i in self.items if i % 16 == cid]
            return
        with open(os.path.join(data_root, "synsetoffset2category.txt")) as f:
            cat = dict(line.strip().split() for line in f if line.strip())
        self.classes_map = {c: i for i, c in enumerate(cat)}
        if class_choice is not None:
            cat = {k: v for k, v in cat.items() if k in class_choice}
        ids = {}
        for s in ("train", "val", "test"):
            with open(os.path.join(data_root, "train_test_split",
                                   f"shuffled_{s}_file_list.json")) as f:
                ids[s] = {d.split("/")[2] for d in json.load(f)}
        wanted = (ids["train"] | ids["val"]) if split == "trainval" else ids[split]
        self.items = []
        for item, synset in cat.items():
            d = os.path.join(data_root, synset)
            for fn in sorted(os.listdir(d)):
                if os.path.splitext(fn)[0] in wanted:
                    self.items.append((item, os.path.join(d, fn)))
        if presample:
            self._presample(data_root)

    def _presample(self, data_root):
        """FPS each shape once to ``num_points`` and cache (reference
        ``shapenetpart.py:233-258``); FPS runs via ``ops.fps`` on the default
        backend instead of the reference's CUDA kernel."""
        fname = os.path.join(data_root, "processed",
                             f"{self.split}_{self.num_points}_fps.pkl")
        if os.path.exists(fname):
            with open(fname, "rb") as f:
                self.pre_data, self.pre_cls = pickle.load(f)
            return
        import jax.numpy as jnp

        from ..ops import fps

        self.pre_data, self.pre_cls = [], []
        for item, path in self.items:
            raw = np.loadtxt(path).astype(np.float32)
            idx = np.asarray(fps(jnp.asarray(raw[None, :, :3]),
                                 min(self.num_points, len(raw))))[0]
            self.pre_data.append(raw[idx])
            self.pre_cls.append(np.asarray([self.classes_map[item]], np.int64))
        os.makedirs(os.path.dirname(fname), exist_ok=True)
        with open(fname, "wb") as f:
            pickle.dump((self.pre_data, self.pre_cls), f)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        rng = self._rng(idx)
        if self.synthetic:
            pos, normals, cls, y = _synth_part(self.items[idx], self.num_points)
        elif self.presample:
            raw, cls = self.pre_data[idx], int(self.pre_cls[idx][0])
            pos, normals = raw[:, :3], raw[:, 3:6]
            y = raw[:, 6].astype(np.int64)
        else:
            item, path = self.items[idx]
            raw = np.loadtxt(path).astype(np.float32)
            cls = self.classes_map[item]
            if "train" in self.split:
                sel = rng.choice(len(raw), self.num_points, replace=True)
            else:
                sel = np.arange(min(self.num_points, len(raw)))
            raw = raw[sel]
            pos, normals = raw[:, :3], raw[:, 3:6]
            y = raw[:, 6].astype(np.int64)
        if self.multihead:
            y = y - self.part_start[int(cls)]
        data = {"pos": pos, "y": y, "cls": np.asarray([cls], dtype=np.int64)}
        data["x"] = np.concatenate([pos, normals], axis=-1) \
            if self.use_normal else pos
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


@DATASETS.register_module(name="ShapeNet")
class ShapeNet(_EpochSeeded):
    """Multi-view render pretraining over ShapeNet55 (reference
    ``shapenet55.py:15``) — the shapenet sibling of ``tooth_6000``: ply
    clouds rolled to [z, x, y], 12-view table at phi = (-1/2 + 1/6)pi,
    per-view jpg renders, ``x`` = pos + height channel."""

    total_views = 12

    def __init__(self, data_dir="", data_root="", n_views: int = 2,
                 num_points=1024, split="train", gravity_dim: int = 2,
                 transform=None, random_view: bool = False,
                 img_size: int = 32, **kwargs):
        root = data_dir or data_root
        self.num_points = num_points
        self.img_size = int(img_size)  # synthetic renders must match the
        # ViewGen decoder output (see cfgs/tooth_pretrain/default.yaml)
        self.n_views = int(n_views)
        self.gravity_dim = int(gravity_dim)
        self.transform = transform
        self.seed = int(kwargs.get("seed", 0))
        self.random_view = bool(random_view)
        theta = np.linspace(0.0, 2.0, self.total_views + 1)[:self.total_views]
        angles = np.stack([theta, np.full_like(theta, -1 / 2 + 1 / 6)],
                          axis=-1) * np.pi
        self.rotation_matrixs = rotate_theta_phi(angles)
        self.synthetic = not (root and os.path.isdir(root))
        if self.synthetic:
            self.file_list = list(range(64))
        else:
            subsets = ["train", "val"] if split == "train" else ["test"]
            sub = "pointclouds_p2048" if num_points == 2048 else "pointclouds"
            self.file_list = []
            for s in subsets:
                d = os.path.join(root, sub, s)
                self.file_list += sorted(os.path.join(d, f)
                                         for f in os.listdir(d))

    def __len__(self):
        return len(self.file_list)

    def _points(self, idx, rng):
        if self.synthetic:
            pts = np.random.default_rng(idx).standard_normal(
                (self.num_points, 3)).astype(np.float32)
        else:
            from .io import IO

            pts = IO.get(self.file_list[idx]).astype(np.float32)
            pts = pts[:, [2, 0, 1]]                 # reference axis roll
        c = pts.mean(0)
        pts = pts - c
        m = np.sqrt((pts ** 2).sum(1)).max()
        return (pts / max(m, 1e-12)).astype(np.float32)

    def _imgs(self, idx, view_ids, views, pts, rng):
        if self.synthetic:
            from .tooth_pretrain import _splat_render
            return np.stack([_splat_render(pts, v, self.img_size)
                             for v in views])
        from PIL import Image

        sub = "pointclouds_p2048" if self.num_points == 2048 else "pointclouds"
        out = []
        for v in view_ids:
            p = self.file_list[idx].replace(sub, "shapenet55v1") \
                .replace(".ply", f"_{str(v + 1).zfill(3)}.jpg")
            out.append(np.asarray(Image.open(p).convert("RGB"),
                                  dtype=np.float32) / 255.0)
        return np.stack(out)

    def __getitem__(self, idx):
        rng = self._rng(idx)
        pts = self._points(idx, rng)
        data = {"pos": pts}
        if self.transform is not None:
            data = self.transform(data, rng)
        g = self.gravity_dim
        height = pts[:, g:g + 1] - pts[:, g:g + 1].min()
        data["x"] = np.concatenate([data["pos"], height], axis=-1)
        if self.random_view:
            assert self.n_views == 1
            angles = np.array([[(rng.random() - 0.5), rng.random() * 2.0]])
            view_ids = np.array([0])
            data["views"] = rotate_theta_phi(angles * np.pi).astype(np.float32)
        else:
            view_ids = rng.choice(self.total_views, self.n_views,
                                  replace=False)
            data["views"] = self.rotation_matrixs[view_ids].astype(np.float32)
        data["imgs"] = self._imgs(idx, view_ids, data["views"],
                                  data["pos"], rng)
        return data


@DATASETS.register_module(name="ShapeNet55")
class ShapeNet55(ShapeNet):
    """Back-compat alias kept from round 1 (same surface as ``ShapeNet``)."""


@DATASETS.register_module(name="ScanObjectNN")
class ScanObjectNN(_EpochSeeded):
    """Real-scan classification (reference ``scanobjectnn.py:12``):
    objectbg/objectonly/hardest h5 modes, train shuffle, ``x`` = pos +
    height-above-min channel."""

    num_classes = 15
    gravity_dim = 2

    def __init__(self, data_dir="", data_root="", num_points=2048,
                 split="train", mode: str = "hardest", transform=None,
                 **kwargs):
        root = data_dir or data_root
        self.num_points = num_points
        self.partition = split
        self.transform = transform
        self.seed = int(kwargs.get("seed", 0))
        self.synthetic = not (root and os.path.isdir(root))
        if self.synthetic:
            self.points = None
            self.items = list(range(64))
            return
        import h5py  # gated: only needed with real data

        name = "training" if split == "train" else "test"
        if mode in ("objectbg", "objectonly"):
            h5 = os.path.join(root, f"{name}_objectdataset.h5")
        elif mode == "hardest":
            h5 = os.path.join(root,
                              f"{name}_objectdataset_augmentedrot_scale75.h5")
        else:
            raise NotImplementedError(f"ScanObjectNN mode {mode}")
        with h5py.File(h5, "r") as f:
            self.points = np.asarray(f["data"]).astype(np.float32)
            self.labels = np.asarray(f["label"]).astype(np.int64)
        self.items = list(range(len(self.points)))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        rng = self._rng(idx)
        if self.points is None:
            pos = np.random.default_rng(idx).standard_normal(
                (self.num_points, 3)).astype(np.float32)
            y = np.int64(idx % self.num_classes)
        else:
            pos = self.points[idx][:self.num_points].copy()
            y = self.labels[idx]
        if self.partition == "train":
            pos = pos[rng.permutation(len(pos))]
        data = {"pos": pos, "y": y}
        if self.transform is not None:
            data = self.transform(data, rng)
        g = self.gravity_dim
        if "heights" in data:
            data["x"] = np.concatenate([data["pos"], data["heights"]], axis=-1)
        else:
            h = pos[:, g:g + 1] - pos[:, g:g + 1].min()
            data["x"] = np.concatenate([data["pos"], h], axis=-1)
        return data
