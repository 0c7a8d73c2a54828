"""Numerical parity of the loss registry against the reference's own
implementations (``openpoints/loss/build.py``), loaded as test-time oracles
with stubbed registry/pointops imports; skipped when /root/reference is
absent.

Convention note: the reference seg losses are channels-first (B, C, N); this
rebuild is channels-last (B, N, C) — the oracles get transposed inputs."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_LOSS = "/root/reference/openpoints/loss/build.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF_LOSS),
                                reason="reference checkout not available")

import jax.numpy as jnp  # noqa: E402

from geot_tpu.losses import build_criterion_from_cfg  # noqa: E402


class _StubRegistry:
    def __init__(self, name):
        self.name = name
        self._modules = {}

    def register_module(self, name=None, module=None):
        if module is not None:
            self._modules[name or module.__name__] = module
            return module

        def deco(cls):
            self._modules[name or cls.__name__] = cls
            return cls

        return deco

    def build(self, cfg, **kwargs):
        cfg = dict(cfg)
        return self._modules[cfg.pop("NAME")](**cfg, **kwargs)


def _load_ref_losses():
    if "ref_loss_build" in sys.modules:
        return sys.modules["ref_loss_build"]
    # stub the reference's framework imports (registry, CUDA pointops)
    reg_mod = types.ModuleType("openpoints.utils.registry")
    reg_mod.Registry = _StubRegistry
    utils_mod = types.ModuleType("openpoints.utils")
    utils_mod.registry = reg_mod
    op_mod = types.ModuleType("openpoints")
    op_mod.utils = utils_mod
    po_fn = types.ModuleType("pointops.functions")
    po_fn.pointops = types.ModuleType("pointops.functions.pointops")
    po_mod = types.ModuleType("pointops")
    po_mod.functions = po_fn
    for k, v in {"openpoints": op_mod, "openpoints.utils": utils_mod,
                 "openpoints.utils.registry": reg_mod, "pointops": po_mod,
                 "pointops.functions": po_fn,
                 "pointops.functions.pointops": po_fn.pointops}.items():
        sys.modules.setdefault(k, v)
    spec = importlib.util.spec_from_file_location("ref_loss_build", REF_LOSS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_loss_build"] = mod
    return mod


B, N, C = 2, 64, 17


def _data(seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, N, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, N))
    return logits, labels


def _cf(x):
    """channels-last numpy -> channels-first torch."""
    return torch.tensor(np.swapaxes(x, 1, 2))


def test_poly1_focal_matches_reference():
    ref = _load_ref_losses().Poly1FocalLoss(epsilon=1.0, alpha=0.25, gamma=2.0)
    ours = build_criterion_from_cfg({"NAME": "Poly1FocalLoss"})
    logits, labels = _data(0)
    with torch.no_grad():
        t = float(ref(_cf(logits), torch.tensor(labels)))
    j = float(ours(jnp.asarray(logits), jnp.asarray(labels)))
    assert j == pytest.approx(t, rel=1e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_poly1_focal_u_matches_reference(use_mask):
    ref = _load_ref_losses().Poly1FocalLoss_U()
    ours = build_criterion_from_cfg({"NAME": "Poly1FocalLoss_U"})
    logits, labels = _data(1)
    rng = np.random.default_rng(2)
    conf = rng.random((B, N)).astype(np.float32)
    if use_mask:
        mask = conf > 0.4
        with torch.no_grad():
            t = float(ref(_cf(logits), torch.tensor(labels),
                          torch.tensor(conf), mask=torch.tensor(mask)))
        j = float(ours(jnp.asarray(logits), jnp.asarray(labels),
                       jnp.asarray(conf), mask=jnp.asarray(mask)))
    else:
        with torch.no_grad():
            t = float(ref(_cf(logits), torch.tensor(labels),
                          torch.tensor(conf), thresh=0.5))
        j = float(ours(jnp.asarray(logits), jnp.asarray(labels),
                       jnp.asarray(conf), thresh=0.5))
    assert j == pytest.approx(t, rel=1e-5)


def test_weight_celoss_matches_reference():
    ref = _load_ref_losses().Weight_CELoss()
    ours = build_criterion_from_cfg({"NAME": "Weight_CELoss"})
    logits, labels = _data(3)
    rng = np.random.default_rng(4)
    cw = rng.random((B, C)).astype(np.float32) + 0.1
    with torch.no_grad():
        t = float(ref(_cf(logits), torch.tensor(labels), torch.tensor(cw)))
    j = float(ours(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(cw)))
    assert j == pytest.approx(t, rel=1e-5)


def test_mse_loss_u_matches_reference():
    ref = _load_ref_losses().MSE_Loss_U()
    ours = build_criterion_from_cfg({"NAME": "MSE_Loss_U"})
    logits, _ = _data(5)
    rng = np.random.default_rng(6)
    target = rng.random((B, N, C)).astype(np.float32)
    target = target / target.sum(-1, keepdims=True)
    with torch.no_grad():
        t = float(ref(_cf(logits), _cf(target), thresh=0.2))
    j = float(ours(jnp.asarray(logits), jnp.asarray(target), thresh=0.2))
    assert j == pytest.approx(t, rel=1e-4)


def test_multishape_ce_matches_reference():
    mod = _load_ref_losses()
    ref = mod.MultiShapeCrossEntropy({"NAME": "CrossEntropy"})
    ours = build_criterion_from_cfg({
        "NAME": "MultiShapeCrossEntropy",
        "criterion_args": {"NAME": "CrossEntropy"}})
    rng = np.random.default_rng(7)
    num_parts = [4, 3]
    shape_labels = np.array([0, 1, 0])
    logits_all = [rng.standard_normal((3, N, p)).astype(np.float32)
                  for p in num_parts]
    labels = np.stack([rng.integers(0, num_parts[s], N)
                       for s in shape_labels])
    with torch.no_grad():
        t = float(ref([_cf(l) for l in logits_all], torch.tensor(labels),
                      torch.tensor(shape_labels)))
    j = float(ours([jnp.asarray(l) for l in logits_all], jnp.asarray(labels),
                   jnp.asarray(shape_labels)))
    assert j == pytest.approx(t, rel=1e-5)
