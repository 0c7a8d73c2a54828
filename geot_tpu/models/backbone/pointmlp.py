"""PointMLP encoder (reference: ``openpoints/models/backbone/pointmlp.py:295-475``).

Residual-MLP point backbone: per-stage fps + kNN grouping with a learnable
geometric-affine normalisation, per-group residual MLP extraction (max-pooled),
then per-point residual MLPs.  Channels-last flax.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import fps, gather_points, grouping_operation, knn
from ..build import MODELS


class ConvBNReLU(nn.Module):
    channels: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, use_bias=self.bias, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """ConvBNReLURes1D (reference ``pointmlp.py:200-241``): bottleneck MLP with
    residual, expansion ratio ``res_expansion``."""

    channels: int
    res_expansion: float = 1.0
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = int(self.channels * self.res_expansion)
        h = nn.Dense(hidden, use_bias=self.bias, name="net1_conv")(x)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="net1_bn")(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels, use_bias=self.bias, name="net2_conv")(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="net2_bn")(h)
        return nn.relu(h + x)


class LocalGrouper(nn.Module):
    """fps + kNN + geometric-affine normalisation
    (reference ``pointmlp.py:86-130``): normalise grouped features by anchor
    (or center) and std, with learnable per-channel alpha/beta."""

    channels: int
    reduce: int
    k: int
    use_xyz: bool = False
    normalize: str = "anchor"

    @nn.compact
    def __call__(self, xyz, feats):
        B, N, _ = xyz.shape
        S = N // self.reduce
        idx = fps(xyz, S)
        new_xyz = gather_points(xyz, idx)
        new_feats = gather_points(feats, idx)
        _, nidx = knn(new_xyz, xyz, self.k)
        g_xyz = grouping_operation(xyz, nidx)                  # (B,S,k,3)
        g_feats = grouping_operation(feats, nidx)              # (B,S,k,C)
        if self.use_xyz:
            g_feats = jnp.concatenate([g_feats, g_xyz], axis=-1)
        if self.normalize:
            if self.normalize == "center":
                mean = jnp.mean(g_feats, axis=2, keepdims=True)
            else:  # anchor
                anchor = (jnp.concatenate([new_feats, new_xyz], axis=-1)
                          if self.use_xyz else new_feats)
                mean = anchor[:, :, None, :]
            std = jnp.std((g_feats - mean).reshape(B, -1), axis=-1)
            std = std[:, None, None, None]
            g_feats = (g_feats - mean) / (std + 1e-5)
            dim = g_feats.shape[-1]
            alpha = self.param("affine_alpha", nn.initializers.ones, (1, 1, 1, dim))
            beta = self.param("affine_beta", nn.initializers.zeros, (1, 1, 1, dim))
            g_feats = alpha * g_feats + beta
        # concat anchor features to every neighbour (reference ``pointmlp.py:128``)
        anchor_full = jnp.broadcast_to(new_feats[:, :, None, :],
                                       new_feats.shape[:2] + (self.k, new_feats.shape[-1]))
        return new_xyz, jnp.concatenate([g_feats, anchor_full], axis=-1)


class PreExtraction(nn.Module):
    """Per-group residual MLP + max-pool (reference ``pointmlp.py:244-273``)."""

    out_channels: int
    blocks: int = 1
    res_expansion: float = 1.0
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x: (B, G, K, D)
        x = ConvBNReLU(self.out_channels, self.bias, name="transfer")(x, training=training)
        for i in range(self.blocks):
            x = ResBlock(self.out_channels, self.res_expansion, self.bias,
                         name=f"op_{i}")(x, training=training)
        return jnp.max(x, axis=2)                              # (B, G, D)


class PosExtraction(nn.Module):
    """Per-point residual MLPs (reference ``pointmlp.py:276-292``)."""

    channels: int
    blocks: int = 1
    res_expansion: float = 1.0
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i in range(self.blocks):
            x = ResBlock(self.channels, self.res_expansion, self.bias,
                         name=f"op_{i}")(x, training=training)
        return x


@MODELS.register_module(name="PointMLPEncoder")
class PointMLPEncoder(nn.Module):
    in_channels: int = 3
    embed_dim: int = 64
    res_expansion: float = 1.0
    bias: bool = False
    use_xyz: bool = False
    normalize: str = "anchor"
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, xyz, features=None, training: bool = False):
        if features is None:
            features = xyz
        x = ConvBNReLU(self.embed_dim, self.bias, name="embedding")(features,
                                                                    training=training)
        last = self.embed_dim
        for i in range(len(self.pre_blocks)):
            out = last * self.dim_expansion[i]
            xyz, grouped = LocalGrouper(last, self.reducers[i], self.k_neighbors[i],
                                        self.use_xyz, self.normalize,
                                        name=f"grouper_{i}")(xyz, x)
            x = PreExtraction(out, self.pre_blocks[i], self.res_expansion,
                              self.bias, name=f"pre_{i}")(grouped, training=training)
            x = PosExtraction(out, self.pos_blocks[i], self.res_expansion,
                              self.bias, name=f"pos_{i}")(x, training=training)
            last = out
        return xyz, x

    def forward_cls_feat(self, xyz, features=None, training: bool = False):
        _, x = self(xyz, features, training=training)
        return jnp.max(x, axis=1)
