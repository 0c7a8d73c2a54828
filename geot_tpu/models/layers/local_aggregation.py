"""Local aggregation (reference: ``openpoints/models/layers/local_aggregation.py``).

The ``convpool`` operator: assemble neighbourhood features (``feature_type``
recipes from ``CHANNEL_MAP``), run a shared pointwise MLP, reduce over the
neighbourhood.  Used by the PointNet++/PointNeXt-style encoders.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import SharedMLP
from .group import create_grouper, get_aggregation_features

CHANNEL_MAP = {
    "fj": lambda x: x,
    "df": lambda x: x,
    "assa": lambda x: x * 3,
    "assa_dp": lambda x: x * 3 + 3,
    "dp_fj": lambda x: 3 + x,
    "pj": lambda x: x,
    "dp": lambda x: 3,
    "pi_dp": lambda x: x + 3,
    "pj_dp": lambda x: x + 3,
    "dp_fj_df": lambda x: x * 2 + 3,
    "dp_fi_df": lambda x: x * 2 + 3,
    "pi_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_df": lambda x: x + 6,
    "dp_df": lambda x: x + 3,
}


class LocalAggregation(nn.Module):
    """convpool local aggregation (reference ``local_aggregation.py:246``):
    group -> assemble -> SharedMLP -> max/mean reduce."""

    channels: Sequence[int]          # mlp output channels (excl. input)
    group_args: dict
    feature_type: str = "dp_fj"
    reduction: str = "max"

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_features,
                 training: bool = False):
        grouper = create_grouper(self.group_args)
        dp, fj = grouper(query_xyz, support_xyz, support_features)
        f_center = None
        if "df" in self.feature_type or "fi" in self.feature_type:
            # center features = support features at the query points; callers
            # that need df pass query_xyz == support_xyz subsets upstream.
            f_center = support_features[:, : query_xyz.shape[1]]
        fj = get_aggregation_features(query_xyz, dp, f_center, fj, self.feature_type)
        fj = SharedMLP(self.channels, name="convs")(fj, training=training)
        if self.reduction in ("max", "maxpool"):
            return jnp.max(fj, axis=2)
        if self.reduction in ("mean", "avg"):
            return jnp.mean(fj, axis=2)
        if self.reduction == "sum":
            return jnp.sum(fj, axis=2)
        raise ValueError(self.reduction)
