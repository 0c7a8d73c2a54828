"""Part-seg eval utilities + kmeans + vis tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from geot_tpu.engine.partseg_eval import (batched_bincount, get_ins_mious,
                                          part_seg_refinement)
from geot_tpu.models.layers.kmeans import kmeans
from geot_tpu.utils import save_ply, vis_multi_points

CLS2PARTS = [[0, 1], [2, 3, 4]]


def test_batched_bincount():
    x = np.array([[0, 0, 1], [2, 2, 2]])
    out = batched_bincount(x, 3)
    np.testing.assert_array_equal(out, [[2, 1, 0], [0, 0, 3]])


def test_get_ins_mious_perfect():
    pred = np.array([[0, 0, 1, 1]])
    mious = get_ins_mious(pred, pred, np.array([[0]]), CLS2PARTS)
    assert mious[0] == 100.0


def test_part_seg_refinement_fixes_invalid_part(rng):
    pos = rng.standard_normal((1, 50, 3)).astype(np.float32)
    pred = np.zeros((1, 50), dtype=np.int64)
    pred[0, :3] = 4  # part 4 invalid for category 0 -> reassigned by kNN vote
    out = part_seg_refinement(pred, pos, np.array([[0]]), CLS2PARTS, n=5)
    assert (out[0, :3] != 4).all()


def test_kmeans_separates_clusters(rng):
    a = rng.standard_normal((30, 2)).astype(np.float32) + 10
    b = rng.standard_normal((30, 2)).astype(np.float32) - 10
    x = jnp.asarray(np.concatenate([a, b]))
    assign, centers = kmeans(x, 2, iters=8)
    assign = np.asarray(assign)
    assert len(set(assign[:30].tolist())) == 1
    assert len(set(assign[30:].tolist())) == 1
    assert assign[0] != assign[-1]


def test_save_ply(tmp_path, rng):
    pts = rng.standard_normal((20, 3)).astype(np.float32)
    labels = rng.integers(0, 17, 20)
    p = save_ply(str(tmp_path / "x.ply"), pts, labels=labels)
    content = open(p).read()
    assert content.startswith("ply") and "element vertex 20" in content
    paths = vis_multi_points([pts, pts], [labels, labels],
                             out_dir=str(tmp_path / "vis"))
    assert all(os.path.exists(q) for q in paths)
