"""Step-by-step numerical parity of the re-derived optimizers against the
reference's own vendored torch implementations (used as test-time oracles;
skipped when /root/reference is absent).

Each case: one 2-D "kernel" + one 1-D "bias" parameter, a fixed gradient
sequence, several steps, trajectories compared to ~1e-5."""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/openpoints/optim"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax.numpy as jnp  # noqa: E402

from geot_tpu.optim import build_optimizer_from_cfg  # noqa: E402

STEPS = 5
SHAPES = {"kernel": (6, 4), "bias": (4,)}


def _load_ref(module):
    # loaded under a synthetic package so the reference's relative imports
    # (sgdp.py: ``from .adamp import projection``) resolve
    import importlib
    import sys
    import types

    if "refoptim" not in sys.modules:
        pkg = types.ModuleType("refoptim")
        pkg.__path__ = [REF]
        sys.modules["refoptim"] = pkg
    return importlib.import_module(f"refoptim.{module}")


def _data(seed=0):
    rng = np.random.default_rng(seed)
    p0 = {k: rng.standard_normal(s).astype(np.float32)
          for k, s in SHAPES.items()}
    grads = [{k: (0.1 * rng.standard_normal(s)).astype(np.float32)
              for k, s in SHAPES.items()} for _ in range(STEPS)]
    return p0, grads


def _run_torch(opt_cls, p0, grads, **kw):
    ps = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in p0.items()}
    opt = opt_cls(list(ps.values()), **kw)
    for g in grads:
        opt.zero_grad()
        for k in ps:
            ps[k].grad = torch.tensor(g[k])
        opt.step()
    return {k: v.detach().numpy() for k, v in ps.items()}


def _run_ours(name, p0, grads, lr, **cfg):
    tx = build_optimizer_from_cfg(None, lr=lr, NAME=name,
                                  filter_bias_and_bn=False, **cfg)
    params = {k: jnp.asarray(v) for k, v in p0.items()}
    state = tx.init(params)
    import optax

    for g in grads:
        updates, state = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                                   state, params)
        params = optax.apply_updates(params, updates)
    return {k: np.asarray(v) for k, v in params.items()}


def _compare(ours, ref, tol=2e-5):
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], atol=tol, rtol=tol,
                                   err_msg=f"param {k}")


@pytest.mark.parametrize("wd,nesterov", [(0.0, False), (0.01, True)])
def test_adamp_matches_reference(wd, nesterov):
    mod = _load_ref("adamp")
    p0, grads = _data(0)
    ref = _run_torch(mod.AdamP, p0, grads, lr=0.01, betas=(0.9, 0.999),
                     eps=1e-8, weight_decay=wd, nesterov=nesterov)
    ours = _run_ours("adamp", p0, grads, lr=0.01, betas=(0.9, 0.999),
                     eps=1e-8, weight_decay=wd, nesterov=nesterov)
    _compare(ours, ref)


@pytest.mark.parametrize("wd,nesterov", [(0.0, False), (0.01, True)])
def test_sgdp_matches_reference(wd, nesterov):
    mod = _load_ref("sgdp")
    p0, grads = _data(1)
    ref = _run_torch(mod.SGDP, p0, grads, lr=0.05, momentum=0.9,
                     weight_decay=wd, nesterov=nesterov)
    ours = _run_ours("sgdp", p0, grads, lr=0.05, momentum=0.9,
                     weight_decay=wd, nesterov=nesterov)
    _compare(ours, ref)


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_madgrad_matches_reference(wd):
    mod = _load_ref("madgrad")
    p0, grads = _data(2)
    ref = _run_torch(mod.MADGRAD, p0, grads, lr=0.01, momentum=0.9,
                     weight_decay=wd)
    ours = _run_ours("madgrad", p0, grads, lr=0.01, momentum=0.9,
                     weight_decay=wd)
    _compare(ours, ref)


def test_rmsprop_tf_matches_reference():
    mod = _load_ref("rmsprop_tf")
    p0, grads = _data(3)
    ref = _run_torch(mod.RMSpropTF, p0, grads, lr=0.01, alpha=0.9,
                     momentum=0.9, eps=1e-10)
    ours = _run_ours("rmsprop_tf", p0, grads, lr=0.01, alpha=0.9,
                     momentum=0.9, eps=1e-10)
    _compare(ours, ref)
