"""``reference_bugs`` compat toggle (VERDICT r3 #8).

The rebuild deliberately fixes two reference NTM bugs (``engine/semi.py``
module docstring): the broadcast row normalisation (``x / torch.sum(x, 1)``
without keepdim, reference ``train.py:538,541,544,558``) and the
``filter_outlier`` view mutation (``train.py:511-513``).  With
``reference_bugs=True`` the rebuild must reproduce the buggy semantics
EXACTLY, so a step-for-step trajectory comparison against a real torch run
stays possible.  Oracle: a literal numpy port of the reference loop,
including the in-place mutation and the broadcast divides.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.engine.semi import (LABEL_PROJ, estimate_class_T,
                                  gaussian_prior_T, ntm_update)

C = 17


def _reference_ntm_numpy(probs_bnc, sigma, geo_lambma, ema_t_decay, ema_t,
                         filter_outlier):
    """Literal port of reference ``train.py:502-558`` (numpy, channels-first
    eta like the torch code: eta_corr is (B, C, N))."""
    B, N, _ = probs_bnc.shape
    eta_corr = np.transpose(probs_bnc, (0, 2, 1)).copy()     # (B, C, N)
    class_T = np.empty((C, C), dtype=np.float64)
    prior_T = np.zeros((C, C), dtype=np.float64)

    def gaussian(x, mu, sig):
        return (np.exp(-((x - mu) ** 2) / (2 * sig ** 2))
                / (sig * np.sqrt(2 * np.pi)))

    for cc in range(C):
        if filter_outlier:
            eta_thresh = np.quantile(eta_corr[:, cc, :], 0.97)
            robust_eta = eta_corr[:, cc, :]
            robust_eta[robust_eta >= eta_thresh] = 0.0       # VIEW mutation
            flat = robust_eta.reshape(B * N)
        else:
            flat = eta_corr[:, cc, :].reshape(B * N)
        idx_best = int(np.argmax(flat))
        b, n = idx_best // N, idx_best % N
        class_T[cc] = eta_corr[b, :, n]                      # mutated gather
        if cc == 0:
            continue
        for cckk in range(C):
            prior_T[cc, cckk] = gaussian(LABEL_PROJ[cckk], LABEL_PROJ[cc],
                                         sigma[cc])

    prior_T[:, 0] = 0
    prior_T[0, 0] = 1
    prior_T = prior_T / np.sum(prior_T, 1)                   # BROADCAST bug
    new_T = geo_lambma * class_T + (1 - geo_lambma) * prior_T
    new_T[0] = class_T[0]
    new_T = new_T / np.sum(new_T, 1)
    ema_t_corr = ema_t * ema_t_decay + new_T * (1 - ema_t_decay)
    ema_t_corr = ema_t_corr / np.sum(ema_t_corr, 1)
    new_ema_t = ema_t * ema_t_decay + class_T * (1 - ema_t_decay)
    new_ema_t = new_ema_t / np.sum(new_ema_t, 1)
    return class_T, ema_t_corr, new_ema_t


@pytest.mark.parametrize("filter_outlier", [False, True])
def test_reference_bugs_matches_torch_loop_oracle(rng, filter_outlier):
    probs = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((2, 64, C)).astype(np.float32)) * 3.0, -1)
    sigma = jnp.asarray(0.3 + 0.2 * rng.random(C).astype(np.float32))
    ema_t = np.eye(C)

    ref_cT, ref_corr, ref_ema = _reference_ntm_numpy(
        np.asarray(probs, dtype=np.float64), np.asarray(sigma),
        0.9, 0.99, ema_t, filter_outlier)

    out = ntm_update(jnp.asarray(ema_t, jnp.float32), probs, sigma,
                     geo_lambda=0.9, ema_t_decay=0.99,
                     filter_outlier=filter_outlier, reference_bugs=True)
    np.testing.assert_allclose(np.asarray(out.class_T), ref_cT, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.ema_t_corr), ref_corr,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.ema_t), ref_ema, atol=2e-6)


def test_reference_bugs_differ_from_fixed(rng):
    """The toggle must actually change semantics (broadcast vs row norm),
    and the FIXED path keeps proper row-stochastic outputs."""
    probs = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((1, 128, C)).astype(np.float32)) * 3.0, -1)
    sigma = jnp.full((C,), 0.4)
    fixed = ntm_update(jnp.eye(C), probs, sigma, geo_lambda=0.9,
                       ema_t_decay=0.9, filter_outlier=True)
    buggy = ntm_update(jnp.eye(C), probs, sigma, geo_lambda=0.9,
                       ema_t_decay=0.9, filter_outlier=True,
                       reference_bugs=True)
    # the mutation bites rarely (the anchor's own column is below its own
    # quantile by construction), so the end-to-end difference is small but
    # must be nonzero (measured ~2e-5 on this input)
    assert np.abs(np.asarray(fixed.ema_t_corr)
                  - np.asarray(buggy.ema_t_corr)).max() > 1e-6
    np.testing.assert_allclose(np.asarray(fixed.ema_t).sum(1), 1.0,
                               atol=1e-5)
    # buggy rows need NOT sum to 1 — that is the bug being reproduced

    # unit level: the broadcast bug divides entry [i, j] by row j's sum
    from geot_tpu.engine.semi import _row_normalize

    x = jnp.asarray(np.abs(np.random.default_rng(0).random((3, 3))) + 0.1)
    good = np.asarray(_row_normalize(x))
    bad = np.asarray(_row_normalize(x, reference_bugs=True))
    np.testing.assert_allclose(good.sum(1), 1.0, atol=1e-6)
    s = np.asarray(x).sum(1)
    np.testing.assert_allclose(bad, np.asarray(x) / s[None, :], atol=1e-6)


def test_estimate_class_T_selection_unchanged_by_toggle(rng):
    """Anchor SELECTION is identical either way (each column is mutated once,
    before its own argmax); only gathered-row contents differ."""
    probs = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((2, 32, C)).astype(np.float32)) * 3.0, -1)
    flat = np.asarray(probs).reshape(-1, C)
    a = np.asarray(estimate_class_T(probs, filter_outlier=True))
    b = np.asarray(estimate_class_T(probs, filter_outlier=True,
                                    reference_bugs=True))
    # rows that had no quantile-zeroed entries are identical; the rest agree
    # wherever b is nonzero
    assert ((a == b) | (b == 0)).all()


def test_semi_step_accepts_reference_bugs_flag():
    """cfg.reference_bugs plumbs through make_semi_step (compile check is in
    the dp-parity/semi-branch suites; here: the factory accepts the flag)."""
    import inspect

    from geot_tpu.engine import steps

    src = inspect.getsource(steps.make_semi_step)
    assert "reference_bugs" in src
