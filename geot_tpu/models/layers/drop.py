"""Stochastic-regularisation layers (reference
``openpoints/models/layers/drop.py`` — timm's DropBlock/DropPath).

Channels-last ``(B, H, W, C)`` images (the reference is NCHW).  The functional
forms take an explicit PRNG ``key`` (the torch versions draw from the global
RNG); the modules draw from the flax ``"dropout"`` RNG stream.  ``DropPath``
(per-sample stochastic depth) lives in :mod:`.common`; the functional
``drop_path`` here mirrors the reference export (``drop.py:135``).

Note: the reference's non-fast ``drop_block_2d`` builds its valid-block mask
with a ``(W, H)`` meshgrid reshaped to ``(H, W)`` — correct only for square
maps (vendored-timm quirk); this port indexes ``(H, W)`` directly, which is
identical for the square feature maps it is ever used on.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import DropPath  # noqa: F401  (re-export for parity)


def drop_path(x, key, drop_prob: float = 0.0, training: bool = False,
              scale_by_keep: bool = True):
    """Per-sample stochastic depth (reference ``drop.py:135-152``)."""
    if drop_prob == 0.0 or not training:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape=shape)
    return jnp.where(mask, x / keep if scale_by_keep else x, 0.0)


def _block_gamma(drop_prob, block_size, H, W):
    clipped = min(block_size, min(W, H))
    total = W * H
    gamma = drop_prob * total / clipped ** 2 / (
        (W - block_size + 1) * (H - block_size + 1))
    return clipped, gamma


def _max_pool_same(m, k):
    """stride-1 max pool with 'same'-style padding k//2 (torch semantics:
    output trimmed back to (H, W))."""
    H, W = m.shape[1], m.shape[2]
    p = k // 2
    out = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)])
    return out[:, :H, :W]  # even k: torch drops the trailing row/col


def drop_block_2d(x, key, drop_prob: float = 0.1, block_size: int = 7,
                  gamma_scale: float = 1.0, with_noise: bool = False,
                  batchwise: bool = False):
    """DropBlock (arXiv:1810.12890; reference ``drop.py:22-67``) on
    ``(B, H, W, C)``: seeds drawn at ``gamma`` only inside the valid region,
    grown to ``block_size`` squares by max-pooling, then normalised."""
    B, H, W, C = x.shape
    clipped, gamma = _block_gamma(drop_prob, block_size, H, W)
    gamma = gamma * gamma_scale

    h_i = jnp.arange(H)[:, None]
    w_i = jnp.arange(W)[None, :]
    valid = ((w_i >= clipped // 2) & (w_i < W - (clipped - 1) // 2)
             & (h_i >= clipped // 2) & (h_i < H - (clipped - 1) // 2))
    valid = valid.astype(x.dtype)[None, :, :, None]

    k_seed, k_noise = jax.random.split(key)
    noise_shape = (1, H, W, C) if batchwise else x.shape
    uniform = jax.random.uniform(k_seed, noise_shape, x.dtype)
    block_mask = ((2 - gamma - valid + uniform) >= 1).astype(x.dtype)
    block_mask = -_max_pool_same(-block_mask, clipped)

    if with_noise:
        normal = jax.random.normal(k_noise, noise_shape, x.dtype)
        return x * block_mask + normal * (1 - block_mask)
    scale = block_mask.size / (jnp.sum(block_mask.astype(jnp.float32)) + 1e-7)
    return x * block_mask * scale.astype(x.dtype)


def drop_block_fast_2d(x, key, drop_prob: float = 0.1, block_size: int = 7,
                       gamma_scale: float = 1.0, with_noise: bool = False):
    """Simplified DropBlock without the valid-region mask
    (reference ``drop.py:70-101``)."""
    B, H, W, C = x.shape
    clipped, gamma = _block_gamma(drop_prob, block_size, H, W)
    gamma = gamma * gamma_scale
    k_seed, k_noise = jax.random.split(key)
    block_mask = jax.random.bernoulli(k_seed, gamma, x.shape).astype(x.dtype)
    block_mask = _max_pool_same(block_mask, clipped)
    if with_noise:
        normal = jax.random.normal(k_noise, x.shape, x.dtype)
        return x * (1.0 - block_mask) + normal * block_mask
    block_mask = 1 - block_mask
    scale = block_mask.size / (jnp.sum(block_mask.astype(jnp.float32)) + 1e-6)
    return x * block_mask * scale.astype(x.dtype)


class DropBlock2d(nn.Module):
    """DropBlock module (reference ``drop.py:104-132``)."""

    drop_prob: float = 0.1
    block_size: int = 7
    gamma_scale: float = 1.0
    with_noise: bool = False
    batchwise: bool = False
    fast: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        if not training or not self.drop_prob:
            return x
        key = self.make_rng("dropout")
        if self.fast:
            return drop_block_fast_2d(x, key, self.drop_prob, self.block_size,
                                      self.gamma_scale, self.with_noise)
        return drop_block_2d(x, key, self.drop_prob, self.block_size,
                             self.gamma_scale, self.with_noise, self.batchwise)
