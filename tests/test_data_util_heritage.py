"""Heritage data_util / dataset plumbing tests (VERDICT r2 missing #3):
hash functions and voxelize against the reference module as an oracle;
DatasetBase/DataList/sample_pc behavioural checks."""
import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/openpoints/dataset/data_util.py"


def _load_ref_data_util():
    pytest.importorskip("torch")
    pytest.importorskip("h5py")
    if not os.path.isfile(REF):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_data_util", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_data_util"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref_data_util()


def test_hash_vecs_match_reference(ref):
    from geot_tpu.data.data_util import fnv_hash_vec, ravel_hash_vec

    coords = np.floor(
        np.random.default_rng(0).standard_normal((2000, 3)) * 20)
    np.testing.assert_array_equal(fnv_hash_vec(coords.copy()),
                                  ref.fnv_hash_vec(coords.copy()))
    np.testing.assert_array_equal(ravel_hash_vec(coords.copy()),
                                  ref.ravel_hash_vec(coords.copy()))


def test_voxelize_val_mode_matches_reference(ref):
    from geot_tpu.data.data_util import voxelize

    coord = np.random.default_rng(1).standard_normal((3000, 3)).astype(
        np.float64)
    s_our, v_our, c_our = voxelize(coord, 0.2, mode=1)
    s_ref, v_ref, c_ref = ref.voxelize(coord, 0.2, mode=1)
    np.testing.assert_array_equal(s_our, s_ref)
    np.testing.assert_array_equal(v_our, v_ref)
    np.testing.assert_array_equal(c_our, c_ref)


def test_voxelize_train_mode_one_point_per_voxel():
    from geot_tpu.data.data_util import fnv_hash_vec, voxelize

    coord = np.random.default_rng(2).standard_normal((3000, 3))
    idx = voxelize(coord, 0.3, rng=np.random.default_rng(0))
    keys = fnv_hash_vec(np.floor(coord / 0.3))
    assert len(np.unique(keys[idx])) == len(idx) == len(np.unique(keys))


def test_crop_pc_shapes_and_anchor_locality():
    from geot_tpu.data.data_util import crop_pc

    rng = np.random.default_rng(3)
    coord = rng.standard_normal((5000, 3)).astype(np.float32) * 5
    feat = rng.standard_normal((5000, 6)).astype(np.float32)
    label = rng.integers(0, 13, 5000)
    c, f, l = crop_pc(coord.copy(), feat.copy(), label.copy(), split="train",
                      voxel_size=0.04, voxel_max=1024,
                      rng=np.random.default_rng(0))
    assert c.shape == (1024, 3) and f.shape == (1024, 6) and l.shape == (1024,)
    assert c.min() >= 0                      # min-shifted
    assert l.dtype == np.int64
    # pad path: fewer points than voxel_max with variable=False
    c2, f2, l2 = crop_pc(coord[:100].copy(), feat[:100].copy(),
                         label[:100].copy(), voxel_size=None, voxel_max=256,
                         downsample=False, variable=False,
                         rng=np.random.default_rng(0))
    assert c2.shape == (256, 3)


def test_rotate_point_clouds_batch_matches_reference(ref):
    torch = pytest.importorskip("torch")
    from geot_tpu.data.data_util import (rotate_point_clouds_batch,
                                         rotate_theta_phi)

    rng = np.random.default_rng(4)
    pc = rng.standard_normal((2, 100, 6)).astype(np.float32)
    angles = rng.uniform(-1, 1, (2, 2)).astype(np.float32)
    R = rotate_theta_phi(angles)
    out = rotate_point_clouds_batch(pc, R, use_normals=True)
    ref_out = ref.rotate_point_clouds_batch(
        torch.tensor(pc), torch.tensor(R), use_normals=True).numpy()
    np.testing.assert_allclose(out, ref_out, atol=1e-5)


def test_dataset_base_lazy_cache_and_disk_roundtrip(tmp_path):
    from geot_tpu.data.dataset_base import DatasetBase

    calls = []

    class Toy(DatasetBase):
        @property
        def record_tokens(self):
            return ["a", "b", "c"]

        def read_record(self, token):
            calls.append(token)
            return {"v": token * 2}

    ds = Toy("toy", "train", cache_dir=None)
    assert len(ds) == 3
    assert ds[0]["v"] == "aa"
    assert ds[0]["v"] == "aa"
    assert calls == ["a"], "record must be read once then memoised"

    ds2 = Toy("toy", "train", cache_dir=str(tmp_path),
              load_cache_if_exists=False)
    ds2.cache(verbose=0)
    assert (tmp_path / "toy" / "train" / "records.pkl").exists()
    ds3 = Toy("toy", "train", cache_dir=str(tmp_path))
    assert ds3.is_cached and ds3[1]["v"] == "bb"


def test_datalist_s3dis_voxel_cover(tmp_path):
    from geot_tpu.data.dataset_base import DataList

    rng = np.random.default_rng(5)
    scene = np.concatenate([rng.standard_normal((800, 3)) * 2,
                            rng.integers(0, 256, (800, 3)),
                            rng.integers(0, 13, (800, 1))], -1)
    p = tmp_path / "scene1.npy"
    np.save(p, scene)
    dl = DataList("s3dis", "val", [str(p)], voxel_size=0.5)
    coord, feat, label, idx_points = dl[0]
    assert coord.min() >= 0 and feat.max() <= 1.0
    # the union of cover passes hits every point at least once
    union = np.unique(np.concatenate(idx_points))
    assert len(union) == len(coord)


def test_sample_pc_off_to_ply(tmp_path):
    from geot_tpu.data.data_util import IO
    from geot_tpu.data.sample_pc import sample_pc

    # unit cube OFF mesh
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    faces = [(0, 1, 2), (0, 2, 3), (4, 5, 6), (4, 6, 7), (0, 1, 5), (0, 5, 4),
             (2, 3, 7), (2, 7, 6), (1, 2, 6), (1, 6, 5), (0, 3, 7), (0, 7, 4)]
    d = tmp_path / "train"
    d.mkdir()
    with open(d / "cube.off", "w") as f:
        f.write(f"OFF\n{len(v)} {len(faces)} 0\n")
        for p in v:
            f.write(" ".join(map(str, p)) + "\n")
        for face in faces:
            f.write("3 " + " ".join(map(str, face)) + "\n")
    sample_pc(str(tmp_path), 128, splits=("train",))
    out = tmp_path / "pointclouds" / "train" / "cube.ply"
    pts = IO.get(str(out))
    assert pts.shape == (128, 3)
    assert pts.min() >= -1e-6 and pts.max() <= 1 + 1e-6
