"""Parity of the part-seg eval helpers against the reference's own
``examples/segmentation/train.py`` definitions (extracted by AST and executed
with torch + pure-torch stand-ins for the openpoints helpers); skipped when
/root/reference is absent."""
import ast
import os
from collections import Counter

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_TRAIN = "/root/reference/examples/segmentation/train.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF_TRAIN),
                                reason="reference checkout not available")

from geot_tpu.engine.partseg_eval import (get_ins_mious,  # noqa: E402
                                          part_seg_refinement)

CLS2PARTS = [[0, 1, 2, 3], [4, 5], [6, 7]]


def _knn_point(k, query, support=None):
    if support is None:
        support = query
    d = torch.cdist(query, support)
    kd = d.topk(k=k, dim=-1, largest=False, sorted=True)
    return kd.values, kd.indices


def _torch_grouping_operation(features, idx):
    all_idx = idx.reshape(idx.shape[0], -1)
    all_idx = all_idx.unsqueeze(1).repeat(1, features.shape[1], 1)
    grouped = features.gather(2, all_idx)
    return grouped.reshape(idx.shape[0], features.shape[1],
                           idx.shape[1], idx.shape[2])


def _load_ref_fns():
    src = open(REF_TRAIN).read()
    tree = ast.parse(src)
    wanted = {"batched_bincount", "part_seg_refinement", "get_ins_mious"}
    mod = ast.Module(body=[n for n in tree.body
                           if isinstance(n, ast.FunctionDef)
                           and n.name in wanted], type_ignores=[])
    ns = {"torch": torch, "np": np, "Counter": Counter,
          "knn_point": _knn_point,
          "torch_grouping_operation": _torch_grouping_operation}
    exec(compile(mod, REF_TRAIN, "exec"), ns)
    return ns


def test_get_ins_mious_matches_reference():
    ns = _load_ref_fns()
    rng = np.random.default_rng(0)
    B, N = 4, 64
    cls = np.array([0, 1, 2, 0])
    pred = np.stack([rng.choice(CLS2PARTS[c], N) for c in cls])
    target = np.stack([rng.choice(CLS2PARTS[c], N) for c in cls])
    # include a U == 0 part (both sides missing part 3 for a cls-0 shape)
    pred[0][pred[0] == 3] = 0
    target[0][target[0] == 3] = 0
    ref = [float(v) for v in ns["get_ins_mious"](
        torch.tensor(pred), torch.tensor(target), torch.tensor(cls),
        CLS2PARTS)]
    got = [float(v) for v in get_ins_mious(pred, target, cls, CLS2PARTS)]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_part_seg_refinement_matches_reference():
    ns = _load_ref_fns()
    rng = np.random.default_rng(1)
    B, N = 3, 128
    cls = np.array([0, 1, 2])
    pos = rng.standard_normal((B, N, 3)).astype(np.float32)
    pred = np.stack([rng.choice(CLS2PARTS[c], N) for c in cls])
    # inject invalid-part labels and small islands
    pred[0, :4] = 6                      # part invalid for cls 0
    pred[1, :3] = 4                      # island smaller than n
    ref = ns["part_seg_refinement"](
        torch.tensor(pred.copy()), torch.tensor(pos), torch.tensor(cls),
        CLS2PARTS, n=10).numpy()
    got = part_seg_refinement(pred.copy(), pos, cls, CLS2PARTS, n=10)
    np.testing.assert_array_equal(np.asarray(got), ref)
