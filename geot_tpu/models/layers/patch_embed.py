"""Point patch embedding tokenizers
(reference: ``openpoints/models/layers/group_embed.py:61+`` — ``PointPatchEmbed``
and ``P3Embed``): point cloud -> subsampled groups -> per-group conv stack ->
max-pooled token per group.  Registered in MODELS like the reference.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..build import MODELS
from .common import SharedMLP
from .group_embed import SubsampleGroup


@MODELS.register_module(name="PointPatchEmbed")
class PointPatchEmbed(nn.Module):
    """fps subsample + ballquery/knn group + SharedMLP + max-pool token."""

    sample_ratio: float = 0.0625     # 1/16 like the reference default
    group_size: int = 32
    in_channels: int = 3
    channels: Sequence[int] = (128, 256)
    subsample: str = "fps"
    group: str = "knn"
    radius: float = 0.1
    feature_type: str = "dp_fj"

    @nn.compact
    def __call__(self, p, x=None, training: bool = False):
        if hasattr(p, "keys"):
            p, x = p["pos"], p.get("x")
        num_groups = max(int(p.shape[1] * self.sample_ratio), 1)
        grouper = SubsampleGroup(num_groups, self.group_size,
                                 self.subsample, self.group, self.radius)
        if x is None:
            grouped_p, center = grouper(p)
            feats = grouped_p                       # (B, G, K, 3) relative
        else:
            grouped_p, center, fj, _ = grouper(p, x)
            feats = jnp.concatenate([grouped_p, fj], axis=-1)
        tokens = SharedMLP(self.channels, name="convs")(feats, training=training)
        return jnp.max(tokens, axis=2), center


@MODELS.register_module(name="P3Embed")
class P3Embed(nn.Module):
    """Progressive 3-stage patch embedding (reference ``group_embed.py``):
    stack of PointPatchEmbed stages halving resolution."""

    stages: int = 3
    sample_ratio: float = 0.25
    group_size: int = 32
    channels: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, p, x=None, training: bool = False):
        if hasattr(p, "keys"):
            p, x = p["pos"], p.get("x")
        feats = x if x is not None else p
        for s in range(self.stages):
            tokens, center = PointPatchEmbed(
                sample_ratio=self.sample_ratio, group_size=self.group_size,
                channels=(self.channels[min(s, len(self.channels) - 1)],),
                name=f"stage_{s}")({"pos": p, "x": feats}, training=training)
            p, feats = center, tokens
        return feats, p
