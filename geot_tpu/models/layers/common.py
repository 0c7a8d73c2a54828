"""Shared flax building blocks.

Conventions for the whole model zoo:
- channels-last ``(B, N, C)`` / ``(B, G, K, C)`` tensors (the reference is
  channels-first torch; channels-last puts C on the TPU lane dimension and
  removes every transpose around matmuls);
- pointwise ``Conv1d(k=1)`` / ``Conv2d(k=1)`` of the reference become
  ``nn.Dense`` applied to the trailing axis — identical math;
- ``training: bool`` switches BatchNorm running stats and dropout/droppath.

Reference counterparts: ``openpoints/models/layers/{conv,mlp,norm,drop}.py``
and ``pointnet2/pytorch_utils.py:8-224`` (SharedMLP).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
    """Round ``v`` to a multiple of ``divisor`` without dropping below
    ``round_limit * v`` (reference ``openpoints/models/layers/helpers.py:26``)."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def drop_path_rates(drop_path_rate: float, depth: int):
    """Linear stochastic-depth schedule, ``torch.linspace(0, r, depth)``."""
    if depth == 1:
        return [float(drop_path_rate)]
    return [float(drop_path_rate) * i / (depth - 1) for i in range(depth)]


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference uses timm's DropPath via
    ``openpoints/models/layers/drop.py``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.rate == 0.0 or not training:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return jnp.where(mask, x / keep, 0.0)


class PointBatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis with torch-compatible defaults
    (momentum 0.1 torch == 0.9 flax, eps 1e-5). Under jit with a sharded batch
    the statistics are computed over the *global* batch, which reproduces the
    reference's SyncBatchNorm conversion (``train.py:160``) with zero code."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, training: bool = False):
        return nn.BatchNorm(use_running_average=not training,
                            momentum=self.momentum, epsilon=self.epsilon,
                            name="bn")(x)


class MlpBlock(nn.Module):
    """Transformer MLP: fc1 -> GELU -> drop -> fc2 -> drop
    (reference ``openpoints/models/backbone/transformer.py:17-33``)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: any = None
    kernel_init: any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not training)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not training)(x)
        return x


class SharedMLP(nn.Module):
    """Stack of pointwise Dense + BN + ReLU, the channels-last equivalent of
    ``pt_utils.SharedMLP`` (reference ``pointnet2/pytorch_utils.py:8``:
    Conv2d(k=1) + BatchNorm2d + ReLU per layer)."""

    channels: Sequence[int]          # output channels per layer
    use_bn: bool = True
    activate_last: bool = True
    dtype: any = None
    kernel_init: any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, training: bool = False):
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype,
                         kernel_init=self.kernel_init, name=f"dense_{i}")(x)
            last = i == n - 1
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not training, dtype=self.dtype,
                                 momentum=0.9, epsilon=1e-5, name=f"bn_{i}")(x)
            if self.activate_last or not last:
                x = nn.relu(x)
        return x
