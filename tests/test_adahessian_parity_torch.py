"""AdaHessian parity against the reference's own optimizer
(``openpoints/optim/adahessian.py``) with draw-for-draw matched Rademacher
vectors; skipped when /root/reference is absent."""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/openpoints/optim/adahessian.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from geot_tpu.optim.adahessian import adahessian, hutchinson_diag  # noqa: E402


def _load_ref(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    spec = importlib.util.spec_from_file_location("ref_adahessian", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


N_STEPS = 5
D = 12


def _problem():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((D, D)).astype(np.float64)
    A = (M @ M.T / D + np.eye(D)).astype(np.float32)     # SPD, non-diagonal
    b = rng.standard_normal(D).astype(np.float32)
    p0 = rng.standard_normal(D).astype(np.float32)
    zs = (rng.integers(0, 2, (N_STEPS, D)) * 2 - 1).astype(np.float32)
    return A, b, p0, zs


def test_adahessian_matches_reference_trajectory(monkeypatch):
    mod = _load_ref(monkeypatch)
    A, b, p0, zs = _problem()

    # ---- torch oracle, z draws forced to our sequence -------------------
    tA, tb = torch.tensor(A), torch.tensor(b)
    p = torch.tensor(p0.copy(), requires_grad=True)
    opt = mod.Adahessian([p], lr=0.05, betas=(0.9, 0.999), eps=1e-8,
                         weight_decay=0.01, hessian_power=1.0)
    step_i = {"i": 0}

    def fake_randint(low, high, size, generator=None, device=None):
        z01 = (torch.tensor(zs[step_i["i"]]) + 1) / 2    # back to {0,1}
        return z01.reshape(size)

    monkeypatch.setattr(torch, "randint", fake_randint)
    for i in range(N_STEPS):
        step_i["i"] = i
        opt.zero_grad()
        loss = 0.5 * p @ tA @ p + tb @ p
        loss.backward(create_graph=True)
        opt.step()
    torch_traj = p.detach().numpy()

    # ---- ours, same z sequence ------------------------------------------
    loss_fn = lambda q: 0.5 * q @ jnp.asarray(A) @ q + jnp.asarray(b) @ q  # noqa: E731
    grad_fn = jax.grad(loss_fn)
    tx = adahessian(0.05, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
                    hessian_power=1.0)
    q = jnp.asarray(p0.copy())
    st = tx.init(q)
    for i in range(N_STEPS):
        g = grad_fn(q)
        d = hutchinson_diag(grad_fn, q, jax.random.PRNGKey(0),
                            zs=[jnp.asarray(zs[i])])
        up, st = tx.update(g, st, q, hessian_diag=d)
        q = optax.apply_updates(q, up)

    np.testing.assert_allclose(np.asarray(q), torch_traj, atol=2e-5)


def test_hutchinson_diag_exact_on_diagonal_hessian():
    """For diagonal H, z * (Hz) = diag(H) exactly for ANY Rademacher z."""
    A = jnp.asarray(np.diag([1.0, 4.0, 9.0]).astype(np.float32))
    loss = lambda p: 0.5 * p @ A @ p  # noqa: E731
    d = hutchinson_diag(jax.grad(loss), jnp.ones(3), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(d), [1.0, 4.0, 9.0], atol=1e-6)


def test_factory_builds_adahessian_and_requires_diag():
    from geot_tpu.optim import build_optimizer_from_cfg

    tx = build_optimizer_from_cfg(None, lr=0.1, NAME="adahessian")
    p = jnp.ones(4)
    st = tx.init(p)
    g = jnp.full(4, 0.5)
    up, _ = tx.update(g, st, p, hessian_diag=jnp.full(4, 2.0))
    assert np.isfinite(np.asarray(up)).all()
    with pytest.raises(TypeError):
        tx.update(g, st, p)          # hessian_diag is required
