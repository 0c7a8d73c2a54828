"""Data pipeline tests: transforms, datasets (synthetic mode), loader,
native IO round-trips."""
import os
import tempfile

import numpy as np
import pytest

from geot_tpu.data import (DATASETS, Compose, build_dataloader_from_cfg,
                           build_semi_dataloader_from_cfg,
                           build_transforms_from_cfg, get_class_weights)
from geot_tpu.data.io import load_obj_vertices
from geot_tpu.data.transforms import DataTransforms

# the exact transform config of the flagship experiment
# (cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml:98-119)
DT_CFG = {
    "train": ["PointsToTensor", "PointCloudScaling", "PointCloudCenterAndNormalize"],
    "train_w": ["PointsToTensor", "PointCloudCenterAndNormalize"],
    "train_s": ["PointsToTensor", "PointCloudScaling_s", "PointCloudCenterAndNormalize",
                "PointCloudRotation_s", "PointCloudTranslation_s"],
    "val": ["PointsToTensor", "PointCloudCenterAndNormalize"],
    "kwargs": {"jitter_sigma": 0.001, "jitter_clip": 0.005, "scale": [0.9, 1.1],
               "gravity_dim": 1, "shift": [0.1, 0.1, 0.1], "angle": [0.5, 0.5, 0.5],
               "jitter_sigma_s": 0.001, "jitter_clip_s": 0.005,
               "scale_s": [0.8, 1.2], "shift_s": [0.2, 0.2, 0.2], "angle_s": [1, 1, 1]},
}

DS_CFG = {
    "common": {"NAME": "TeethSegSemiLDataset", "data_root": "/nonexistent",
               "num_points": 512},
    "train": {"split": "train"},
    "val": {"split": "val"},
}


class TestTransforms:
    def test_center_and_normalize(self, rng):
        t = build_transforms_from_cfg("val", DT_CFG)
        pos = rng.standard_normal((100, 3)).astype(np.float32) * 5 + 3
        data = t({"pos": pos.copy(), "x": pos.copy()}, rng)
        assert np.abs(data["pos"].mean(0)).max() < 1e-5
        assert np.sqrt((data["pos"] ** 2).sum(-1)).max() == pytest.approx(1.0, abs=1e-5)
        assert "heights" in data

    def test_rotation_preserves_norms(self, rng):
        t = DataTransforms.build({"NAME": "PointCloudRotation", "angle": [1, 1, 1]})
        pos = rng.standard_normal((64, 3)).astype(np.float32)
        out = t({"pos": pos.copy()}, rng)["pos"]
        np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                                   np.linalg.norm(pos, axis=1), atol=1e-4)
        assert not np.allclose(out, pos)

    def test_strong_kwargs_convention(self, rng):
        """_s transforms must read *_s kwargs (FixMatch strength split)."""
        t = DataTransforms.build({"NAME": "PointCloudScaling_s",
                                  "scale": [1.0, 1.0], "scale_s": [3.0, 3.0]})
        pos = np.ones((10, 3), dtype=np.float32)
        out = t({"pos": pos.copy()}, rng)["pos"]
        np.testing.assert_allclose(out, 3.0, atol=1e-5)

    def test_scaling_range(self, rng):
        t = DataTransforms.build({"NAME": "PointCloudScaling", "scale": [0.9, 1.1]})
        pos = np.ones((10, 3), dtype=np.float32)
        out = t({"pos": pos.copy()}, rng)["pos"]
        assert (out >= 0.9 - 1e-6).all() and (out <= 1.1 + 1e-6).all()


class TestDatasets:
    def test_labeled_synthetic_train(self):
        ds = DATASETS.build({"NAME": "TeethSegSemiLDataset",
                             "data_root": "/nonexistent", "num_points": 512,
                             "split": "train"})
        assert ds.synthetic and len(ds) > 0
        s = ds[0]
        assert s["pos"].shape == (512, 3) and s["y"].shape == (512,)
        assert s["class_weights"].shape == (17,)
        assert s["class_weights"].sum() == pytest.approx(1.0, abs=1e-5)
        assert set(np.unique(s["y"])) <= set(range(17))

    def test_labeled_val_has_fullres(self):
        ds = DATASETS.build({"NAME": "TeethSegSemiLDataset",
                             "data_root": "/nonexistent", "num_points": 256,
                             "split": "val"})
        s = ds[0]
        for k in ("points", "labels", "center", "scale"):
            assert k in s
        assert len(s["points"]) > 256

    def test_unlabeled_weak_strong_keys(self):
        tw = build_transforms_from_cfg("train_w", DT_CFG)
        ts = build_transforms_from_cfg("train_s", DT_CFG)
        ds = DATASETS.build({"NAME": "TeethSegSemiUDataset",
                             "data_root": "/nonexistent", "num_points": 256,
                             "split": "train", "transform_w": tw, "transform_s": ts})
        s = ds[0]
        for k in ("pos_w", "pos_s", "x_w", "x_s", "cls_w", "cls_s", "raw_pos"):
            assert k in s, k
        # strong is more aggressively augmented than weak
        assert not np.allclose(s["pos_w"], s["pos_s"])

    def test_loaders_batch_shapes(self):
        loader = build_dataloader_from_cfg(4, DS_CFG, {"num_workers": 2},
                                           DT_CFG, split="train")
        batch = next(iter(loader))
        assert batch["pos"].shape == (4, 512, 3)
        assert batch["y"].shape == (4, 512)

        semi_cfg = {"common": {"NAME": "TeethSegSemiUDataset",
                               "data_root": "/nonexistent", "num_points": 512},
                    "train": {"split": "train"}}
        loader_u = build_semi_dataloader_from_cfg(4, semi_cfg, {"num_workers": 2},
                                                  DT_CFG, split="train")
        batch_u = next(iter(loader_u))
        assert batch_u["pos_s"].shape == (4, 512, 3)

    def test_epoch_shuffling_changes_order(self):
        loader = build_dataloader_from_cfg(4, DS_CFG, {"num_workers": 1},
                                           DT_CFG, split="train")
        loader.set_epoch(0)
        a = loader._epoch_indices()
        loader.set_epoch(1)
        b = loader._epoch_indices()
        assert not np.array_equal(a, b)

    def test_sharding_partitions(self):
        loader = build_dataloader_from_cfg(2, DS_CFG, {"num_workers": 1},
                                           DT_CFG, split="val")
        loader.num_shards, loader.shard_index = 2, 0
        a = set(loader._epoch_indices().tolist())
        loader.shard_index = 1
        b = set(loader._epoch_indices().tolist())
        assert a.isdisjoint(b)

    def test_shapenetpart_synthetic(self):
        ds = DATASETS.build({"NAME": "ShapeNetPartNormal", "data_root": "",
                             "num_points": 128})
        s = ds[3]
        assert s["pos"].shape == (128, 3) and s["x"].shape == (128, 6)

    def test_class_weights_helper(self):
        w = get_class_weights([10, 20, 70], normalize=True)
        assert w.shape == (3,) and abs(w.sum() - 3.0) < 1e-5
        assert w[0] > w[2]  # rare class weighted up


class TestNativeIO:
    def test_obj_roundtrip(self, rng):
        verts = rng.standard_normal((100, 3)).astype(np.float32)
        with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
            f.write("# comment\n")
            for v in verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            f.write("f 1 2 3\nvn 0 0 1\n")
            path = f.name
        try:
            loaded = load_obj_vertices(path)
            assert loaded.shape == (100, 3)
            np.testing.assert_allclose(loaded, verts, atol=1e-5)
        finally:
            os.unlink(path)

    def test_obj_no_trailing_newline_page_multiple(self):
        # regression: a vertex line at EOF with no trailing newline, on a file
        # whose size is an exact page multiple — strtof used to scan past the
        # mmap'd region (potential SIGSEGV); now the tail line is parsed from
        # a bounded NUL-terminated copy
        last = "v 7.5 -2.25 0.125"          # 17 bytes, no newline
        page = 4096
        pad = page - (len(last) % page)
        body = "# " + "x" * (pad - 3) + "\n"  # comment line sized to align
        with tempfile.NamedTemporaryFile("w", suffix=".obj",
                                         delete=False) as f:
            f.write(body + last)
            path = f.name
        try:
            assert os.path.getsize(path) % page == 0
            loaded = load_obj_vertices(path)
            assert loaded.shape == (1, 3)
            np.testing.assert_allclose(loaded[0], [7.5, -2.25, 0.125])
        finally:
            os.unlink(path)

    def test_native_grid_subsample_matches_numpy(self, rng):
        from geot_tpu.native import grid_subsample_native
        from geot_tpu.ops import grid_subsample

        pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
        labels = rng.integers(0, 5, 500).astype(np.int32)
        native = grid_subsample_native(pts, labels=labels, sample_dl=0.5,
                                       num_classes=5)
        if native is None:
            pytest.skip("native toolchain unavailable")
        np_pts, np_lab = grid_subsample(pts, labels=labels, sample_dl=0.5,
                                        num_classes=5)
        na_pts, na_lab = native
        assert len(na_pts) == len(np_pts)
        # voxel order may differ; compare as sorted sets
        order_a = np.lexsort(na_pts.T)
        order_b = np.lexsort(np_pts.T)
        np.testing.assert_allclose(na_pts[order_a], np_pts[order_b], atol=1e-5)
        np.testing.assert_array_equal(na_lab[order_a], np_lab[order_b])


class TestDeterminismAndCutmix:
    def test_same_epoch_same_batch(self):
        from geot_tpu.data import build_dataloader_from_cfg

        def first_batch():
            loader = build_dataloader_from_cfg(2, DS_CFG, {"num_workers": 1},
                                               DT_CFG, split="train", seed=7)
            loader.set_epoch(3)
            return next(iter(loader))

        a, b = first_batch(), first_batch()
        np.testing.assert_allclose(a["pos"], b["pos"])
        np.testing.assert_array_equal(a["y"], b["y"])

    def test_different_epoch_differs(self):
        from geot_tpu.data import build_dataloader_from_cfg

        loader = build_dataloader_from_cfg(2, DS_CFG, {"num_workers": 1},
                                           DT_CFG, split="train", seed=7)
        loader.set_epoch(1)
        a = next(iter(loader))
        loader.set_epoch(2)
        b = next(iter(loader))
        assert not np.allclose(a["pos"], b["pos"])

    def test_cutmix_batch_mixing(self):
        from geot_tpu.data import build_dataloader_from_cfg

        dt = {"train": ["PointsToTensor", "Cutmix"],
              "kwargs": {"prob": 1.0, "num_mix": 1}}
        loader = build_dataloader_from_cfg(4, DS_CFG, {"num_workers": 1}, dt,
                                           split="train", seed=0)
        assert loader.batch_mixers, "Cutmix should register as a batch mixer"
        batch = next(iter(loader))
        assert batch["pos"].shape == (4, 512, 3)


class TestPretrainDatasets:
    """Behavioural checks of the TAP multi-view pretraining datasets
    (reference ``tooth_dataset.py:44,171``), synthetic fallback path."""

    def test_tooth_6000_payload(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "tooth_6000", "n_views": 2,
                                     "num_points": 512, "split": "train"})
        d = ds[0]
        assert d["pos"].shape == (512, 3)
        assert d["x"].shape == (512, 4)          # pos + height channel
        assert d["x"][:, 3].min() == 0.0         # height above min
        assert d["views"].shape == (2, 3, 3)
        # rotations are orthonormal with det +1
        for R in d["views"]:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) > 0.99
        assert d["imgs"].ndim == 4 and d["imgs"].shape[0] == 2
        assert d["imgs"].shape[-1] == 3          # channels-last renders

    def test_splat_render_geometry_consistent(self):
        """Synthetic renders are view-consistent depth splats (white bg,
        rotation-equivariant), not noise — the pretraining task is learnable."""
        from geot_tpu.data.tooth_pretrain import _splat_render

        g = np.random.default_rng(0)
        pts = g.standard_normal((2048, 3)).astype(np.float32)
        R = np.linalg.qr(g.standard_normal((3, 3)))[0].astype(np.float32)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        img = _splat_render(pts, R, 32)
        assert img.shape == (32, 32, 3)
        fg = (img < 1).any(-1)
        assert 0.0 < fg.mean() < 1.0             # white bg + real silhouette
        # render(pts, R) == render(pts @ R.T, I): camera frame is pts @ R.T
        np.testing.assert_allclose(
            img, _splat_render(pts @ R.T, np.eye(3, dtype=np.float32), 32),
            atol=1e-6)
        # a different cloud produces a different image
        pts2 = g.standard_normal((2048, 3)).astype(np.float32)
        assert not np.allclose(img, _splat_render(pts2, R, 32))

    def test_tooth_6000_jaw_tables_differ(self):
        from geot_tpu.data.tooth_pretrain import Tooth6000

        ds = Tooth6000(n_views=1, num_points=64, split="train")
        assert not np.allclose(ds.rot_lower, ds.rot_upper)
        assert ds.rot_lower.shape == (12, 3, 3)

    def test_tooth_6000_random_view(self):
        from geot_tpu.data.tooth_pretrain import Tooth6000

        ds = Tooth6000(n_views=1, num_points=64, split="train",
                       random_view=True)
        a = ds[0]["views"]
        ds.epoch = 1
        b = ds[0]["views"]
        assert a.shape == (1, 3, 3) and not np.allclose(a, b)

    def test_tooth_6000_pca_weight_maps(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "tooth_6000_pca", "n_views": 2,
                                     "num_points": 256, "split": "train"})
        d = ds[0]
        assert d["views"].shape == (2, 3, 3)
        assert np.array_equal(d["x"], d["pos"])  # pca variant: x is raw pos
        assert d["weight"].shape == d["imgs"].shape[:3]
        assert d["weight"].max() <= 1.0 and d["weight"].min() >= 0.0

    def test_finetune_dataset_eval_payload(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "TeethSegFinetuneDataset",
                                     "num_points": 256, "split": "val"})
        d = ds[0]
        assert d["pos"].shape == (256, 3)
        assert "points" in d and "center" in d and "scale" in d
        assert d["class_weights"].shape == (17,)


class TestHeritageDatasets:
    """Behavioural checks of the openpoints-heritage datasets (reference
    ``shapenetpart.py``, ``shapenet55.py``, ``scanobjectnn.py``), synthetic
    fallback path."""

    def test_shapenetpart_onehot_features(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "ShapeNetPart", "num_points": 128,
                                     "split": "trainval"})
        d = ds[3]
        assert d["pos"].shape == (128, 3)
        assert d["x"].shape == (128, 16)          # per-point category one-hot
        assert d["x"].sum(-1).max() == 1.0 and (d["x"].sum(0) > 0).sum() == 1
        assert d["y"].shape == (128,)

    def test_shapenetpart_normal_multihead(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "ShapeNetPartNormal",
                                     "num_points": 128, "split": "train",
                                     "multihead": True})
        for i in range(4):
            d = ds[i]
            seg_num = ds.seg_num[int(d["cls"][0])]
            assert d["y"].min() >= 0 and d["y"].max() < seg_num
        assert ds.cls2partembed.shape == (16, 50)

    def test_shapenetpart_curve_payload(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "ShapeNetPartCurve",
                                     "num_points": 128, "split": "test"})
        d = ds[0]
        assert set(d) >= {"pos", "cls", "y"}

    def test_shapenet_multiview_payload(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "ShapeNet", "n_views": 2,
                                     "num_points": 128, "split": "train"})
        d = ds[0]
        assert d["x"].shape == (128, 4)           # pos + height channel
        assert d["views"].shape == (2, 3, 3)
        assert d["imgs"].shape[0] == 2 and d["imgs"].shape[-1] == 3
        # unit norm after pc_norm
        assert np.sqrt((d["pos"] ** 2).sum(-1)).max() <= 1.0 + 1e-5

    def test_scanobjectnn_height_channel(self):
        from geot_tpu.data.build import build_dataset_from_cfg

        ds = build_dataset_from_cfg({"NAME": "ScanObjectNN",
                                     "num_points": 128, "split": "train"})
        d = ds[0]
        assert d["x"].shape == (128, 4)
        assert d["x"][:, 3].min() == 0.0


def test_heritage_datasets_epoch_varying_augmentation():
    """ADVICE r2 (medium): the loader's set_epoch forwarding must change the
    per-item augmentation RNG on the heritage datasets, deterministically."""
    from geot_tpu.data.shapenetpart import ShapeNetPart, ScanObjectNN

    for cls, kw in ((ShapeNetPart, {"split": "trainval"}),
                    (ScanObjectNN, {"split": "train"})):
        ds = cls(data_root="", num_points=256, **kw)
        assert hasattr(ds, "epoch")
        ds.epoch = 0
        a0 = ds[3]["pos"].copy()
        ds.epoch = 1
        a1 = ds[3]["pos"].copy()
        ds.epoch = 0
        a0_again = ds[3]["pos"].copy()
        assert not np.allclose(a0, a1), f"{cls.__name__}: epoch must vary aug"
        np.testing.assert_allclose(a0, a0_again)


def test_two_shard_loader_disjoint_coverage():
    """VERDICT r2 #7: per-host loader sharding — two shards of the same
    loader must index disjoint sample sets whose union covers the dataset."""
    from geot_tpu.data.build import DataLoader
    from geot_tpu.data.shapenetpart import ShapeNetPart

    ds = ShapeNetPart(data_root="", num_points=64, split="train")

    def indices(shard_index, epoch):
        loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                            seed=0, num_shards=2, shard_index=shard_index)
        loader.set_epoch(epoch)
        return list(loader._epoch_indices())

    for epoch in (1, 2):
        i0, i1 = indices(0, epoch), indices(1, epoch)
        assert not (set(i0) & set(i1)), "shards must be disjoint"
        assert set(i0) | set(i1) == set(range(len(ds))), \
            "shards must cover the dataset"
    assert indices(0, 1) != indices(0, 2), "shuffle must vary by epoch"


def test_uneven_shard_padding_equalizes_lengths():
    """When len(dataset) doesn't fill whole global batches, shards either
    drop the ragged tail (drop_last, matching a single-process loader) or
    wrap-pad to a full global batch — both keep per-host batch counts equal
    (unequal counts would deadlock a multi-host sharded step), and the
    block layout keeps host slices concatenating to the single-process
    global batch row-for-row."""
    from geot_tpu.data.build import DataLoader

    class _Tiny:
        def __len__(self):
            return 33

        def __getitem__(self, i):
            return {"pos": np.zeros((4, 3), np.float32)}

    ds = _Tiny()
    loaders = [DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                          seed=0, num_shards=2, shard_index=s)
               for s in (0, 1)]
    for ld in loaders:
        ld.set_epoch(3)
    i0, i1 = loaders[0]._epoch_indices(), loaders[1]._epoch_indices()
    # wrap-pad (drop_last=False): 33 -> 40 (5 global batches of 8), 20/shard
    assert len(i0) == len(i1) == 20
    assert len(loaders[0]) == len(loaders[1])
    assert set(i0) | set(i1) == set(range(33)), "union still covers"

    # drop_last: ragged tail dropped -> 32 rows, 16/shard, and the block
    # layout reconstructs the single-process batch order exactly
    loaders = [DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                          num_workers=1, seed=0, num_shards=2, shard_index=s)
               for s in (0, 1)]
    single = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=1, seed=0)
    for ld in loaders + [single]:
        ld.set_epoch(3)
    i0, i1 = loaders[0]._epoch_indices(), loaders[1]._epoch_indices()
    # the unsharded loader truncates at batching time, not in
    # _epoch_indices — compare against its first 4 full batches
    ref = single._epoch_indices()[:32]
    assert len(i0) == len(i1) == 16
    got = []
    for b in range(4):
        got.extend(i0[b * 4:(b + 1) * 4])
        got.extend(i1[b * 4:(b + 1) * 4])
    assert got == list(ref), "host blocks must concat to the global order"


def test_teeth_cls_dataset_payload():
    """TeethClsDataset (reference tooth_dataset.py:510): jaw-id label, pos +
    height feature channel, epoch-varying sampling."""
    from geot_tpu.data import DATASETS

    ds = DATASETS.build({"NAME": "TeethClsDataset", "data_root": "",
                         "num_points": 128})
    assert ds.num_classes == 2
    d = ds[1]
    assert d["pos"].shape == (128, 3) and d["x"].shape == (128, 4)
    assert d["y"].shape == (1,) and d["y"][0] in (0, 1)
    np.testing.assert_allclose(d["x"][:, :3], d["pos"])
    assert d["x"][:, 3].min() == 0  # height above min
    ds.epoch = 1
    d2 = ds[1]
    assert not np.allclose(d["pos"], d2["pos"])


def test_teeth_cls_axis_roll():
    """The cls dataset is the one tooth dataset where the reference's axis
    roll ``points[:, [2, 0, 1]]`` is ACTIVE (``tooth_dataset.py:598``) — the
    sampled cloud must be drawn from the rolled+normalised points and the
    height channel must read the rolled axis (review r3)."""
    from geot_tpu.data import DATASETS
    from geot_tpu.data.tooth_semi import pc_norm

    ds = DATASETS.build({"NAME": "TeethClsDataset", "data_root": "",
                         "num_points": 64})
    raw, _ = ds._load(ds.file_list[0])
    expect_norm, _, _ = pc_norm(raw[:, [2, 0, 1]])
    d = ds[0]
    # every sampled point must be a row of the rolled+normalised cloud
    dmin = np.min(np.linalg.norm(
        d["pos"][:, None, :] - expect_norm[None], axis=-1), axis=1)
    assert float(dmin.max()) < 1e-5
    h = d["pos"][:, 2:3] - d["pos"][:, 2:3].min()
    np.testing.assert_allclose(d["x"][:, 3:], h, atol=1e-6)


def test_binary_ply_mixed_property_types(tmp_path):
    """Binary PLY with uchar color properties after float coords (review r3:
    every non-'float' property was mapped to 8 bytes, mis-striding the
    record) and float64 coords."""
    import struct

    from geot_tpu.data.io import _read_ply_xyz

    pts = np.array([[0.5, -1.25, 2.0], [3.5, 4.0, -0.125]], np.float32)
    p = tmp_path / "colored.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 2\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
                b"end_header\n")
        for i, row in enumerate(pts):
            f.write(struct.pack("<fffBBB", *row, 10 * i, 20, 30))
    np.testing.assert_allclose(_read_ply_xyz(str(p)), pts)

    p2 = tmp_path / "double.ply"
    with open(p2, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 2\n"
                b"property float64 x\nproperty float64 y\nproperty float64 z\n"
                b"end_header\n")
        for row in pts:
            f.write(struct.pack("<ddd", *row))
    np.testing.assert_allclose(_read_ply_xyz(str(p2)), pts)
