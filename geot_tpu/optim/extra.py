"""Optimizers from the reference's vendored timm set that optax lacks.

Reference ``openpoints/optim/`` vendors timm's AdamP/SGDP
(``openpoints/optim/adamp.py``, ``sgdp.py``), MADGRAD
(``openpoints/optim/madgrad.py``) and Lookahead (``lookahead.py``), dispatched
from ``optim_factory.py:156``.  Each is re-derived here as a pure optax
``GradientTransformation`` — state is an explicit pytree (donatable, shardable
under pjit) instead of in-place torch buffer mutation.

AdamP/SGDP use the reference's exact two-stage projection (channel view
first, flattened layer view as fallback — ``adamp.py:25``), verified step-by-
step against the reference's own torch implementations in
``tests/test_optim_parity_torch.py``.  AdaHessian lives in
``optim/adahessian.py`` as a ``GradientTransformationExtraArgs`` — the
Hutchinson Hessian diagonal is one ``jax.jvp`` through the grad fn and is
passed to ``update(..., hessian_diag=...)``.
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax


class ScaleByAdamPState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def _projection(p, grad, perturb, delta, wd_ratio, eps):
    """AdamP ``projection`` (reference ``openpoints/optim/adamp.py:25``):
    CHANNEL view first, then LAYER view — if the gradient is nearly
    orthogonal to the weight under either view (scale-invariant weights,
    e.g. behind a norm), remove the radial component of the step and shrink
    weight decay.  Exact port: cosine = |a.b| / max(|a||b|, eps) like
    ``F.cosine_similarity``; the channel branch short-circuits the layer one."""
    expand = (-1,) + (1,) * (p.ndim - 1)

    def try_view(view):
        pv = view(p)
        gv = view(grad)
        dot = jnp.sum(pv * gv, axis=1)
        cos = jnp.abs(dot) / jnp.maximum(
            jnp.linalg.norm(pv, axis=1) * jnp.linalg.norm(gv, axis=1), eps)
        cond = jnp.max(cos) < delta / np.sqrt(pv.shape[1])
        p_n = p / (jnp.linalg.norm(pv, axis=1) + eps).reshape(expand)
        projected = perturb - p_n * jnp.sum(view(p_n * perturb),
                                            axis=1).reshape(expand)
        return cond, projected

    cond_c, proj_c = try_view(lambda x: x.reshape(x.shape[0], -1))
    cond_l, proj_l = try_view(lambda x: x.reshape(1, -1))
    out = jnp.where(cond_c, proj_c, jnp.where(cond_l, proj_l, perturb))
    ratio = jnp.where(cond_c | cond_l, jnp.asarray(wd_ratio, p.dtype),
                      jnp.asarray(1.0, p.dtype))
    return out, ratio


def adamp(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, nesterov: bool = False,
          filter_bias_and_bn: bool = True) -> optax.GradientTransformation:
    """AdamP (Heo et al., 2021) — Adam whose effective step is projected onto
    the tangent space of scale-invariant weights, preventing the norm growth
    that plain momentum causes under BN/LN.  Reference vendored copy:
    ``openpoints/optim/adamp.py``."""

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByAdamPState(count=jnp.zeros([], jnp.int32), mu=z(), nu=z())

    def update(updates, state, params):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def step(p, g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            if nesterov:
                perturb = (b1 * m + (1 - b1) * g) / bc1 / denom
            else:
                perturb = (m / bc1) / denom
            ratio = jnp.asarray(1.0, p.dtype)
            if p.ndim >= 2:
                perturb, ratio = _projection(p, g, perturb, delta, wd_ratio, eps)
            # decoupled decay, scaled by the projection ratio (timm adamp.py);
            # rank-<2 params (bias/norm) get no decay, as in the reference's
            # param-group split (optim_factory.py:31-55)
            decay = weight_decay * ratio if (p.ndim >= 2 or not filter_bias_and_bn) else 0.0
            return perturb + decay * p

        new_updates = jax.tree_util.tree_map(step, params, updates, mu, nu)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        new_updates = jax.tree_util.tree_map(lambda u: -lr * u, new_updates)
        return new_updates, ScaleByAdamPState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class ScaleBySGDPState(NamedTuple):
    count: chex.Array
    momentum: optax.Updates


def sgdp(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0,
         dampening: float = 0.0, nesterov: bool = False, eps: float = 1e-8,
         delta: float = 0.1, wd_ratio: float = 0.1,
         filter_bias_and_bn: bool = True) -> optax.GradientTransformation:
    """SGDP — SGD+momentum with the same scale-invariant projection as AdamP.
    Reference vendored copy: ``openpoints/optim/sgdp.py``."""

    def init(params):
        return ScaleBySGDPState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(updates, state, params):
        count = state.count + 1
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + (1 - dampening) * g,
            state.momentum, updates)

        def proj(p, g, b):
            d_p = g + momentum * b if nesterov else b
            ratio = jnp.asarray(1.0, p.dtype)
            if p.ndim >= 2:
                d_p, ratio = _projection(p, g, d_p, delta, wd_ratio, eps)
            return d_p, ratio

        projected = jax.tree_util.tree_map(proj, params, updates, buf)
        d_p_tree = jax.tree_util.tree_map(lambda t: t[0], projected,
                                          is_leaf=lambda x: isinstance(x, tuple))
        ratio_tree = jax.tree_util.tree_map(lambda t: t[1], projected,
                                            is_leaf=lambda x: isinstance(x, tuple))

        def add_decay(p, d_p, ratio):
            # reference sgdp.py:64: decay scaled by 1/(1 - momentum)
            decay = (weight_decay * ratio / (1.0 - momentum)
                     if (p.ndim >= 2 or not filter_bias_and_bn) else 0.0)
            return d_p + decay * p

        new_updates = jax.tree_util.tree_map(add_decay, params, d_p_tree,
                                             ratio_tree)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        new_updates = jax.tree_util.tree_map(lambda u: -lr * u, new_updates)
        # bug-compatible with the reference (sgdp.py:46-60): for the plain
        # (non-nesterov) path d_p IS the momentum buffer in torch, so the
        # projection's in-place subtraction mutates the stored momentum —
        # verified against the vendored implementation step by step
        new_momentum = buf if nesterov else d_p_tree
        return new_updates, ScaleBySGDPState(count, new_momentum)

    return optax.GradientTransformation(init, update)


class MadgradState(NamedTuple):
    count: chex.Array
    grad_sum: optax.Updates      # s_k = sum lambda_i g_i
    grad_sum_sq: optax.Updates   # v_k = sum lambda_i g_i^2
    x0: optax.Updates            # initial params (dual-averaging anchor)


def madgrad(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0,
            eps: float = 1e-6) -> optax.GradientTransformation:
    """MADGRAD (Defazio & Jelassi, 2021): momentumized dual averaging with a
    cube-root adaptive denominator.  Reference vendored copy:
    ``openpoints/optim/madgrad.py`` — its in-place ``x0 = p + s/denom``
    reconstruction becomes an explicit ``x0`` pytree in the state."""

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        # copy=True: jnp.asarray would alias the param buffers, which
        # breaks donated train steps (same buffer donated twice)
        return MadgradState(count=jnp.zeros([], jnp.int32), grad_sum=z(),
                            grad_sum_sq=z(),
                            x0=jax.tree_util.tree_map(
                                lambda x: jnp.array(x, copy=True), params))

    def update(updates, state, params):
        if params is None:
            raise ValueError("madgrad requires params")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        lamb = lr * jnp.sqrt(count.astype(jnp.float32))

        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)

        s = jax.tree_util.tree_map(lambda a, g: a + lamb * g,
                                   state.grad_sum, updates)
        v = jax.tree_util.tree_map(lambda a, g: a + lamb * g * g,
                                   state.grad_sum_sq, updates)

        def step(p, s_k, v_k, x0):
            z = x0 - s_k / (jnp.cbrt(v_k) + eps)
            x_next = (1 - momentum) * z + momentum * p
            return x_next - p

        new_updates = jax.tree_util.tree_map(step, params, s, v, state.x0)
        return new_updates, MadgradState(count, s, v, state.x0)

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    count: chex.Array
    slow: optax.Updates


def lookahead(alpha: float = 0.5, k: int = 6) -> optax.GradientTransformation:
    """Lookahead (Zhang et al., 2019) as a chainable transform: every ``k``
    fast steps, pull the fast weights toward the slow weights by ``alpha``.
    Reference vendored copy: ``openpoints/optim/lookahead.py`` (timm wraps the
    torch optimizer object; here it chains AFTER any inner transform, so the
    incoming ``updates`` are the inner optimizer's final step)."""

    def init(params):
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params))

    def update(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % k) == 0

        def step(u, p, s):
            fast = p + u
            slow_next = s + alpha * (fast - s)
            u_sync = slow_next - p           # land on the synced slow weights
            return jnp.where(sync, u_sync, u)

        def slow_upd(u, p, s):
            fast = p + u
            return jnp.where(sync, s + alpha * (fast - s), s)

        new_slow = jax.tree_util.tree_map(slow_upd, updates, params, state.slow)
        new_updates = jax.tree_util.tree_map(step, updates, params, state.slow)
        return new_updates, LookaheadState(count, new_slow)

    return optax.GradientTransformation(init, update)
