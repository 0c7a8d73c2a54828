"""Parity of the pseudo-label refinement ops against the reference's own
``utils/pseudo_mask.py`` (torch oracle with a cdist-based stand-in for the
CUDA pointops kNN and ``.cuda()`` patched to a no-op); skipped when
/root/reference is absent."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/utils/pseudo_mask.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason="reference checkout not available")

import jax.numpy as jnp  # noqa: E402

from geot_tpu.engine import pseudo_mask as ours  # noqa: E402


def _load_ref(monkeypatch):
    po_fn_po = types.ModuleType("pointops.functions.pointops")

    def _knn_stub(q, s, k):
        d = torch.cdist(q, s)
        dist, idx = d.topk(k, dim=-1, largest=False)
        return idx.int(), dist

    po_fn_po.knn = _knn_stub
    po_fn = types.ModuleType("pointops.functions")
    po_fn.pointops = po_fn_po
    po = types.ModuleType("pointops")
    po.functions = po_fn
    monkeypatch.setitem(sys.modules, "pointops", po)
    monkeypatch.setitem(sys.modules, "pointops.functions", po_fn)
    monkeypatch.setitem(sys.modules, "pointops.functions.pointops", po_fn_po)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    spec = importlib.util.spec_from_file_location("ref_pseudo_mask", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


B, N, C = 2, 96, 17


def _data(seed):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, N, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    pos = rng.standard_normal((B, N, 3)).astype(np.float32)
    return probs, pos


def test_refine_matches_reference(monkeypatch):
    mod = _load_ref(monkeypatch)
    probs, pos = _data(0)
    ref_mask = mod.pseudo_label_refine(
        torch.tensor(np.swapaxes(probs, 1, 2)), 0.9, torch.tensor(pos),
        neigborhood_size=4, n_neigbors=1)
    our_mask = ours.pseudo_label_refine(jnp.asarray(probs), 0.9,
                                        jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(our_mask), ref_mask.numpy())


def test_refine_margin_matches_reference(monkeypatch):
    mod = _load_ref(monkeypatch)
    probs, pos = _data(1)
    ref_mask, ref_margin = mod.pseudo_label_refine_margin(
        torch.tensor(np.swapaxes(probs, 1, 2)), 0.3, torch.tensor(pos),
        neigborhood_size=4, n_neigbors=1)
    our_mask, our_margin = ours.pseudo_label_refine_margin(
        jnp.asarray(probs), 0.3, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(our_margin), ref_margin.numpy(),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(our_mask), ref_mask.numpy())


def test_refine_margin_v1_matches_reference(monkeypatch):
    mod = _load_ref(monkeypatch)
    probs, pos = _data(2)
    ref_mask, ref_margin, _ = mod.pseudo_label_refine_margin_v1(
        torch.tensor(np.swapaxes(probs, 1, 2)), 0.3, 80, torch.tensor(pos),
        neigborhood_size=4, n_neigbors=1)
    our_mask, our_margin, _ = ours.pseudo_label_refine_margin_v1(
        jnp.asarray(probs), 0.3, 80, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(our_margin), ref_margin.numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(our_mask), ref_mask.numpy())
