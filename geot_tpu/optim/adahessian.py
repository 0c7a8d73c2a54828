"""AdaHessian — adaptive second-order optimizer.

Reference: ``openpoints/optim/adahessian.py`` (torch, double backward via
``torch.autograd.grad`` on the gradient graph).  Round 2 excluded it because
it "needs a second backward pass"; in JAX that pass is one ``jax.jvp``
through the gradient function (forward-over-reverse), so the port is small:

- ``hutchinson_diag(grad_fn, params, rng)``: Rademacher z, Hz via jvp,
  diag(H) ~ E[z * Hz]  (reference ``set_hessian``, ``adahessian.py:75-100``)
- ``adahessian(...)``: the Adam-like update with the squared HESSIAN diagonal
  in the second moment (reference ``step``, ``adahessian.py:103-155``),
  exposed as an ``optax.GradientTransformationExtraArgs`` taking the
  ``hessian_diag`` pytree as an extra update argument.

Typical train-step usage::

    grad_fn = jax.grad(loss_fn)
    grads = grad_fn(params)
    diag = hutchinson_diag(grad_fn, params, rng)
    updates, opt_state = tx.update(grads, opt_state, params,
                                   hessian_diag=diag)
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def hutchinson_diag(grad_fn, params, rng, n_samples: int = 1, zs=None):
    """Hutchinson estimate of diag(H): mean over samples of z * (H @ z) with
    Rademacher z (reference ``set_hessian``).  ``zs`` (a list of pytrees)
    overrides the random draws — used by the parity tests to match the torch
    oracle draw-for-draw."""
    leaves, treedef = jax.tree_util.tree_flatten(params)

    def one(rng_i, z_given):
        if z_given is None:
            keys = jax.random.split(rng_i, len(leaves))
            z = treedef.unflatten([
                (jax.random.randint(k, l.shape, 0, 2) * 2 - 1).astype(l.dtype)
                for k, l in zip(keys, leaves)])
        else:
            z = z_given
        _, hz = jax.jvp(grad_fn, (params,), (z,))
        return jax.tree_util.tree_map(lambda a, b: a * b, z, hz)

    total = None
    for i in range(n_samples):
        d = one(jax.random.fold_in(rng, i), None if zs is None else zs[i])
        total = d if total is None else jax.tree_util.tree_map(
            jnp.add, total, d)
    return jax.tree_util.tree_map(lambda t: t / n_samples, total)


class AdahessianState(NamedTuple):
    count: chex.Array
    exp_avg: optax.Updates
    exp_hessian_diag_sq: optax.Updates


def adahessian(learning_rate: float = 0.1, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0,
               hessian_power: float = 1.0) -> optax.GradientTransformationExtraArgs:
    """The AdaHessian update (reference ``step``): AdamW-style decoupled
    weight decay, first moment of grads, second moment of the SQUARED
    Hessian diagonal, denом ``(nu_hat)^(k/2) + eps``."""

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)  # noqa: E731
        return AdahessianState(count=jnp.zeros((), jnp.int32),
                               exp_avg=zeros(), exp_hessian_diag_sq=zeros())

    def update(updates, state, params=None, *, hessian_diag, **extra):
        del extra
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates)
        nu = jax.tree_util.tree_map(
            lambda v, h: b2 * v + (1 - b2) * h * h,
            state.exp_hessian_diag_sq, hessian_diag)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        k = hessian_power

        def step(p, m, v):
            denom = jnp.power(v / bc2, k / 2.0) + eps
            return -learning_rate * (weight_decay * p + m / (bc1 * denom))

        new_updates = jax.tree_util.tree_map(step, params, mu, nu)
        return new_updates, AdahessianState(count=count, exp_avg=mu,
                                            exp_hessian_diag_sq=nu)

    return optax.GradientTransformationExtraArgs(init, update)
