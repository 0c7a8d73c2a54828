"""Tokenizers: point cloud -> subsampled groups.

- ``SubsampleGroup``: fps/random subsample + ballquery/knn grouping
  (reference ``openpoints/models/layers/group_embed.py:16-57``).
- ``GroupTokenizer``: the FPS + kNN ``Group`` used by the Point Transformer
  backbones — returns center-normalised neighbourhoods
  (reference ``openpoints/models/backbone/transformer.py:275-303``).

Both are stateless callables (no parameters), so they are plain classes, not
flax modules.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops import fps, gather_points, grouping_operation, knn
from .group import KNNGroup, QueryAndGroup


class SubsampleGroup:
    def __init__(self, num_groups: int = 256, group_size: int = 32,
                 subsample: str = "fps", group: str = "ballquery",
                 radius: float = 0.1, **kwargs):
        self.num_groups = num_groups
        self.group_size = group_size
        self.subsample = subsample.lower()
        if "ball" in group.lower() or "query" in group.lower():
            self.grouper = QueryAndGroup(radius, group_size)
        elif "knn" in group.lower():
            self.grouper = KNNGroup(group_size)
        else:
            raise NotImplementedError(group)

    def __call__(self, p, x=None):
        if any(s in self.subsample for s in ("fps", "furthest", "farthest")):
            idx = fps(p, self.num_groups)
        else:
            raise NotImplementedError(self.subsample)
        center_p = gather_points(p, idx)
        if x is not None:
            center_x = gather_points(x, idx)
            grouped_p, fj = self.grouper(center_p, p, x)
            return grouped_p, center_p, fj, center_x
        grouped_p, _ = self.grouper(center_p, p)
        return grouped_p, center_p


class GroupTokenizer:
    """FPS centers + kNN neighbourhoods, normalised by the center.

    Returns (neighborhood (B, G, K, 3), center (B, G, 3), idx (B, G, K)) like
    the reference ``Group.forward`` (``transformer.py:282-303``), except idx is
    per-cloud (the reference flattens with a batch offset).
    """

    def __init__(self, num_group: int, group_size: int):
        self.num_group = num_group
        self.group_size = group_size

    def __call__(self, xyz: jnp.ndarray):
        center = gather_points(xyz, fps(xyz, self.num_group))      # (B, G, 3)
        _, idx = knn(center, xyz, self.group_size)                  # (B, G, K)
        neighborhood = grouping_operation(xyz, idx)                 # (B, G, K, 3)
        neighborhood = neighborhood - center[:, :, None, :]
        return neighborhood, center, idx
