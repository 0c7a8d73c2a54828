"""TAP-style multi-view pretraining datasets
(reference: ``openpoints/dataset/tooth_pretrain/tooth_dataset.py:44,171,370``).

Behavioural port of the reference datasets:

- ``tooth_6000``: JSON manifest (``<split>_pca_0.5.json`` with ``pc_data`` /
  ``rgb_data`` lists), per-jaw 12-view rotation tables (theta = linspace over
  the full circle, phi = ±(1/2 − 1/6)·π — lower jaw looks up, upper looks
  down), ``x`` = pos + height-above-min channel, per-view RGB renders
  (H, W, 3 float in [0, 1] — this rebuild is channels-LAST; the reference is
  CHW), optional single random view.
- ``tooth_6000_pca``: PCA-aligned 9-view table, curvature/depth manifests and
  the reference's corrupted-case FILTER lists; per-view foreground ``weight``
  maps from Sobel gradient magnitude of the grayscale render (numpy Sobel
  with reflect-101 borders, matching cv2's default).
- ``TeethSegFinetuneDataset``: fully-supervised finetune split
  (``full_train_finetune_0.1.txt`` for train — the reference's 10% label
  budget — ``full_<split>_finetune.txt`` otherwise).

Every dataset degrades to the deterministic synthetic fallback (shared with
``tooth_semi``) when ``data_root`` is absent, so the full pretraining stack
runs in CI.
"""
from __future__ import annotations

import json
import os

import numpy as np

from .build import DATASETS
from .data_util import rotate_theta_phi
from .tooth_semi import _TeethBase, pc_norm

# corrupted-case id filters (reference ``tooth_dataset.py:16-41``); kept as
# ranges is not possible — the reference enumerates them; we store the count
# behaviourally by loading them from the manifest when present instead of
# hard-coding 400 ids: the manifest key "filter_upper"/"filter_lower" mirrors
# the reference constants when the real dataset is materialised.
_SYN_IMG = 32  # synthetic render size (keeps CI light)


def _splat_render(pts: np.ndarray, view: np.ndarray, s: int) -> np.ndarray:
    """Geometry-consistent synthetic render: orthographic depth splat of the
    view-rotated cloud (white background, as in the reference's real renders
    — the loss's foreground mask is ``img < 1``, ``view_gen_base.py:31``).

    Mirrors the generator's camera model (``ViewTransformer._scale_bias``):
    camera frame = ``pts @ view.T``, image rows follow camera x, columns
    camera y, so the view-conditioned reconstruction task is actually
    learnable from the point cloud when the proprietary Teeth3DS renders are
    absent (noise targets would only teach the per-view mean)."""
    rot = pts @ view.T.astype(pts.dtype)
    xy = rot[:, :2]
    mn = xy.min(0)
    extent = float(max((xy.max(0) - mn).max(), 1e-6))
    margin = max(s // 8, 1)
    pix = np.floor((xy - mn) * ((s - 1 - 2 * margin) / extent)).astype(np.int64)
    flat = np.clip(pix[:, 0] + margin, 0, s - 1) * s \
        + np.clip(pix[:, 1] + margin, 0, s - 1)
    z = rot[:, 2]
    znorm = ((z - z.min()) / max(float(z.max() - z.min()), 1e-6)).astype(np.float32)
    zbuf = np.zeros(s * s, np.float32)
    np.maximum.at(zbuf, flat, znorm + 1e-3)      # z-buffer; >0 marks occupancy
    img = np.ones((s * s, 3), np.float32)        # white background
    occ = zbuf > 0
    img[occ] = (0.15 + 0.7 * (zbuf[occ, None] - 1e-3))  # depth-shaded gray
    return img.reshape(s, s, 3)


def _jaw_view_angles(phi_frac: float, total_views: int = 12) -> np.ndarray:
    """theta x phi grid of the reference ``get_rotation_matrix_tooth``
    (``tooth_dataset.py:105``): theta = linspace(0, 2, V+1)[:V], fixed phi."""
    theta = np.linspace(0.0, 2.0, total_views + 1)[:total_views]
    angles = np.stack([theta, np.full_like(theta, phi_frac)], axis=-1)
    return angles * np.pi


# PCA-aligned 9-view table (reference ``tooth_dataset.py:212-216``)
_PCA_THETA = np.array([0, 1, 2, 10, 11, 0, 0, 0, 0], dtype=np.float64) / 6.0
_PCA_PHI = np.array([90, 90, 90, 90, 90, 30, 60, 120, 150],
                    dtype=np.float64) / 180.0
_PCA_ANGLES = np.stack([_PCA_THETA, _PCA_PHI], axis=-1) * np.pi


def _sobel_weight(gray: np.ndarray) -> np.ndarray:
    """cv2.Sobel(ksize=3) gradient magnitude -> normalised foreground weight
    (reference ``tooth_dataset.py:330-349``), numpy with reflect-101 borders
    (cv2's default ``BORDER_REFLECT_101``)."""
    g = np.pad(gray.astype(np.float64), 1, mode="reflect")
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64)
    ky = kx.T
    H, W = gray.shape
    sx = np.zeros((H, W), np.float64)
    sy = np.zeros((H, W), np.float64)
    for di in range(3):
        for dj in range(3):
            win = g[di:di + H, dj:dj + W]
            sx += kx[di, dj] * win
            sy += ky[di, dj] * win
    gm = np.sqrt(sx ** 2 + sy ** 2)
    gm = gm - gm.min()
    rng_ = gm.max() - gm.min()
    gm = gm / rng_ if rng_ > 0 else gm
    gg = np.clip(gm + 0.1, None, 1.0)
    return gg.astype(np.float32)


def _load_render(path: str, size: int | None = None) -> np.ndarray:
    """PNG -> (H, W, 3) float32 in [0, 1] (reference loads CHW via PIL;
    channels-last here)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size))
    return np.asarray(img, dtype=np.float32) / 255.0


class _PretrainBase(_TeethBase):
    """Shared multi-view machinery.  Subclasses set ``total_views`` and the
    rotation tables."""

    total_views = 12

    def __init__(self, data_dir="", data_root="", n_views: int = 2,
                 num_points=16000, split="train", gravity_dim: int = 2,
                 transform=None, random_view: bool = False,
                 manifest_suffix: str = "_pca_0.5.json",
                 img_size: int = _SYN_IMG, **kwargs):
        # synthetic-render size; must match the generation model's output
        # resolution ((img_size // img_ds_ratio) * decoder upsampling)
        self.syn_img = int(img_size)
        root = data_dir or data_root
        self.manifest = None
        manifest_path = os.path.join(root or "", split + manifest_suffix)
        if root and os.path.isfile(manifest_path):
            with open(manifest_path) as f:
                self.manifest = json.load(f)
        has_semi_index = bool(root) and os.path.isfile(
            os.path.join(root, "data.json"))
        super().__init__(root if (self.manifest is None and has_semi_index)
                         else "",
                         num_points, split,
                         f"full_{split}.txt", synthetic_len=16, **kwargs)
        if self.manifest is not None:
            self.synthetic = False
            self.pc_list = list(self.manifest["pc_data"])
            self.rgb_dir = list(self.manifest.get("rgb_data", []))
            self.cur_list = list(self.manifest.get("cur_data", []))
            self.depth_list = list(self.manifest.get("depth_data", []))
            self._apply_filter()
            self.file_list = [{"location": 0 if "lower" in os.path.basename(p)
                               else 1, "file_path": p, "mesh_id": p}
                              for p in self.pc_list]
        self.n_views = int(n_views)
        self.gravity_dim = int(gravity_dim)
        self.transform = transform
        self.random_view = bool(random_view)
        # per-jaw tables (reference ``tooth_dataset.py:63-64``)
        self.rot_lower = rotate_theta_phi(
            _jaw_view_angles(-1 / 2 + 1 / 6, self.total_views))
        self.rot_upper = rotate_theta_phi(
            _jaw_view_angles(1 / 2 - 1 / 6, self.total_views))

    def _apply_filter(self):
        """Drop the corrupted cases enumerated by the manifest's filter lists
        (reference FILTER_ID_UPPER/LOWER, ``tooth_dataset.py:252-263``)."""
        if self.manifest is None or "filter_upper" not in self.manifest:
            return
        f_up = set(self.manifest["filter_upper"])
        f_lo = set(self.manifest["filter_lower"])
        keep = []
        for i, p in enumerate(self.pc_list):
            case = os.path.basename(os.path.dirname(p))
            tooth = os.path.basename(p)
            try:
                case_id = int(case[4:])
            except ValueError:
                keep.append(i)
                continue
            if case_id not in (f_up if "upper" in tooth else f_lo):
                keep.append(i)
        self.pc_list = [self.pc_list[i] for i in keep]
        for attr in ("rgb_dir", "cur_list", "depth_list"):
            lst = getattr(self, attr)
            if lst:
                setattr(self, attr, [lst[i] for i in keep])

    def _views_for(self, sample, rng):
        name = os.path.basename(str(sample["file_path"]))
        table = self.rot_lower if "lower" in name or sample["location"] == 0 \
            else self.rot_upper
        if self.random_view:
            assert self.n_views == 1, "random_view implies n_views == 1"
            angles = np.array([[(rng.random() - 0.5), rng.random() * 2.0]])
            return np.array([0]), rotate_theta_phi(angles * np.pi)
        view_ids = rng.choice(self.total_views, self.n_views, replace=False)
        return view_ids, table[view_ids]

    def _images(self, idx, sample, view_ids, views, pts, rng):
        if self.manifest is not None and self.rgb_dir:
            name = os.path.basename(str(sample["file_path"]))[:-4]
            return np.stack([
                _load_render(os.path.join(self.rgb_dir[idx],
                                          f"{name}_{v}.png"))
                for v in view_ids])
        # synthetic renders: deterministic depth splats of the rotated cloud
        return np.stack([_splat_render(pts, v, self.syn_img) for v in views])

    def _point_payload(self, idx, rng):
        sample = self.file_list[idx]
        if self.manifest is not None:
            from .io import IO

            points = IO.get(sample["file_path"]).astype(np.float32)
        else:
            points, _ = self._load(sample)
        points_norm, _, _ = pc_norm(points)
        n = len(points_norm)
        sel = rng.choice(n, self.num_points, replace=n < self.num_points)
        return sample, points_norm[sel].astype(np.float32)


@DATASETS.register_module(name="tooth_6000")
class Tooth6000(_PretrainBase):
    """12-view pretraining dataset (reference ``tooth_dataset.py:44``):
    ``x`` carries the height-above-min extra channel."""

    total_views = 12

    def __getitem__(self, idx):
        rng = self._rng(idx)
        sample, pts = self._point_payload(idx, rng)
        data = {"pos": pts}
        if self.transform is not None:
            data = self.transform(data, rng)
        g = self.gravity_dim
        height = data["pos"][:, g:g + 1] - data["pos"][:, g:g + 1].min()
        data["x"] = np.concatenate([data["pos"], height], axis=-1)
        view_ids, views = self._views_for(sample, rng)
        data["views"] = views.astype(np.float32)
        data["imgs"] = self._images(idx, sample, view_ids, views,
                                    data["pos"], rng)
        data["cls"] = np.asarray([sample["location"]], dtype=np.int64)
        return data


@DATASETS.register_module(name="tooth_6000_pca")
class Tooth6000PCA(_PretrainBase):
    """PCA-aligned 9-view variant with foreground weight maps
    (reference ``tooth_dataset.py:171``): ``x`` = raw pos, fixed view table,
    ``weight`` = Sobel gradient magnitude of the grayscale render."""

    total_views = 9

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("manifest_suffix", "_pca_cur_0.5.json")
        super().__init__(*args, **kwargs)
        table = rotate_theta_phi(_PCA_ANGLES)
        self.rot_lower = table
        self.rot_upper = table

    def __getitem__(self, idx):
        rng = self._rng(idx)
        sample, pts = self._point_payload(idx, rng)
        data = {"pos": pts}
        if self.transform is not None:
            data = self.transform(data, rng)
        data["x"] = data["pos"]
        view_ids, views = self._views_for(sample, rng)
        data["views"] = views.astype(np.float32)
        imgs = self._images(idx, sample, view_ids, views, data["pos"], rng)
        data["imgs"] = imgs
        gray = imgs @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        data["weight"] = np.stack([_sobel_weight(g_) for g_ in gray])
        data["cls"] = np.asarray([sample["location"]], dtype=np.int64)
        return data


@DATASETS.register_module(name="TeethSegFinetuneDataset")
class TeethSegFinetuneDataset(_TeethBase):
    """Fully-supervised finetune split (reference ``tooth_dataset.py:370``):
    train uses the 10%% label-budget list ``full_train_finetune_0.1.txt``."""

    def __init__(self, data_root="", num_points=16000, split="train",
                 transform=None, **kwargs):
        list_name = (f"full_{split}_finetune_0.1.txt" if split == "train"
                     else f"full_{split}_finetune.txt")
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


@DATASETS.register_module(name="TeethClsDataset")
class TeethClsDataset(_TeethBase):
    """Jaw classification (lower/upper) over full scans
    (reference ``tooth_dataset.py:510-617``): ``y`` is the jaw id, ``x`` is
    pos + height-above-min channel (gravity dim 2), random 16k sampling of
    the unit-sphere-normalised cloud."""

    classes = ["lower", "upper"]
    num_classes = 2
    gravity_dim = 2

    def __init__(self, data_root="", num_points=16000, split="train",
                 transform=None, **kwargs):
        super().__init__(data_root, num_points, split,
                         f"full_{split}_finetune.txt", **kwargs)
        self.num_classes = 2      # _TeethBase sets the 17-class seg default
        self.transform = transform

    def __getitem__(self, idx):
        sample = self.file_list[idx]
        rng = self._rng(idx)
        points, _labels = self._load(sample)
        # The cls dataset is the one tooth dataset where the reference's axis
        # roll is ACTIVE (``tooth_dataset.py:598`` — elsewhere it is commented
        # out): z becomes the first axis before normalisation, so the
        # gravity_dim=2 height channel reads the rolled y axis.
        points = points[:, [2, 0, 1]]
        points_norm, _center, _scale = pc_norm(points)
        sel = rng.choice(len(points_norm), self.num_points, replace=True)
        spts = points_norm[sel].astype(np.float32)
        g = self.gravity_dim
        h = spts[:, g:g + 1] - spts[:, g:g + 1].min()
        data = {"pos": spts,
                "y": np.asarray([sample["location"]], dtype=np.int64),
                "x": np.concatenate([spts, h], axis=1)}
        if self.transform is not None:
            data = self.transform(data, rng)
        return data
