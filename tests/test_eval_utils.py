"""Part-seg eval utilities + kmeans + vis tests."""
import os

import numpy as np
import pytest
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
    # signature now matches the reference: (points, colors=None, labels=None)
    paths = vis_multi_points([pts, pts], labels=[labels, labels],
                             out_dir=str(tmp_path / "vis"))
    assert all(os.path.exists(q) for q in paths)


class TestHeritageMetrics:
    """PartNet/ShapeNetPart protocol metrics (reference
    ``openpoints/utils/metrics.py:179,236,265``)."""

    def test_iou_from_confusions_perfect(self):
        from geot_tpu.core.metrics import IoU_from_confusions

        cm = np.diag([5, 3, 2]).astype(np.float64)[None]
        iou = IoU_from_confusions(cm)
        np.testing.assert_allclose(iou, np.ones((1, 3)), atol=1e-4)

    def test_iou_from_confusions_absent_class_substituted(self):
        from geot_tpu.core.metrics import IoU_from_confusions

        cm = np.array([[[4, 0, 0], [0, 0, 0], [0, 0, 4]]], dtype=np.float64)
        iou = IoU_from_confusions(cm)
        # class 1 absent -> gets the row mIoU (1.0) substituted
        np.testing.assert_allclose(iou[0], [1, 1, 1], atol=1e-4)

    def test_partnet_metrics_perfect_prediction(self):
        from geot_tpu.core.metrics import partnet_metrics

        rng = np.random.default_rng(0)
        num_parts = [4, 3]
        objects = [0, 1, 0]
        targets = [rng.integers(0, num_parts[o], 64) for o in objects]
        preds = []
        for o, t in zip(objects, targets):
            logit = np.zeros((num_parts[o], 64))
            logit[t, np.arange(64)] = 10.0
            preds.append(logit)
        ms, mp, mms, mmp = partnet_metrics(2, num_parts, objects, preds, targets)
        assert mms == pytest.approx(1.0)
        assert mmp == pytest.approx(1.0)

    def test_shapenetpart_metrics_perfect(self):
        from geot_tpu.core.metrics import shapenetpart_metrics

        rng = np.random.default_rng(0)
        num_parts = [4, 3]
        objects = [0, 1]
        targets = [rng.integers(0, num_parts[o], 64) for o in objects]
        masks = [np.ones(64, bool) for _ in objects]
        preds = []
        for o, t in zip(objects, targets):
            logit = np.zeros((num_parts[o], 64))
            logit[t, np.arange(64)] = 10.0
            preds.append(logit)
        acc, objs_avg, cls_avg, inst_avg = shapenetpart_metrics(
            2, num_parts, objects, preds, targets, masks)
        assert acc == pytest.approx(1.0)
        assert cls_avg == pytest.approx(1.0) and inst_avg == pytest.approx(1.0)


def test_metrics_from_cm_matches_seg_metrics_whole(rng):
    """The device confusion-matrix eval path must reproduce
    ``seg_metrics_whole`` exactly."""
    from geot_tpu.core.metrics import seg_metrics_whole
    from geot_tpu.engine.eval import _metrics_from_cm
    NUM_CLASSES = 17

    pred = rng.integers(0, NUM_CLASSES, 5000)
    label = rng.integers(0, NUM_CLASSES, 5000)
    # drop some classes from the ground truth to exercise the absent-class path
    label[label == 5] = 6
    label[label == 11] = 0
    cm = np.bincount(label * NUM_CLASSES + pred,
                     minlength=NUM_CLASSES ** 2).reshape(NUM_CLASSES, -1)
    a0, m0, d0 = seg_metrics_whole(pred, label)
    a1, m1, d1 = _metrics_from_cm(cm)
    assert a1 == pytest.approx(a0, abs=1e-12)
    assert m1 == pytest.approx(m0, abs=1e-12)
    assert d1 == pytest.approx(d0, abs=1e-12)
