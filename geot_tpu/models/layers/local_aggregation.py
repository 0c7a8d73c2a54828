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


def _reduce(fj, reduction, axis=2):
    if reduction in ("max", "maxpool"):
        return jnp.max(fj, axis=axis)
    if reduction in ("mean", "avg"):
        return jnp.mean(fj, axis=axis)
    if reduction == "sum":
        return jnp.sum(fj, axis=axis)
    raise ValueError(reduction)


class ASSA(nn.Module):
    """Anisotropic separable set abstraction (reference
    ``local_aggregation.py:30-137``, ASSANet): pointwise pre-convs on support
    features, neighbourhood outer product with the 3 relative coordinates
    (channels x3), reduce, pointwise post-convs, residual."""

    channels: Sequence[int]          # output channels per conv (excl. input)
    group_args: dict
    reduction: str = "mean"
    use_res: bool = True

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_features,
                 training: bool = False):
        import math

        chans = list(self.channels)
        num_preconv = math.ceil(len(chans) / 2)
        # mirror the reference's channel bookkeeping: pre-conv output is
        # divided by 3 so the dp outer product restores it
        pre_chans = chans[:num_preconv]
        pre_chans[-1] = math.ceil(pre_chans[-1] / 3.0)
        f = support_features
        for i, c in enumerate(pre_chans):
            f = nn.Dense(c, use_bias=False, name=f"pre_{i}")(f)
            f = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f"pre_bn_{i}")(f)
            f = nn.relu(f)
        skip = f[:, : query_xyz.shape[1]]

        grouper = create_grouper(self.group_args)
        dp, fj = grouper(query_xyz, support_xyz, f)            # (B,M,K,3),(B,M,K,C')
        fj = fj[..., None, :] * dp[..., :, None]               # (B,M,K,3,C')
        B, M, K = fj.shape[:3]
        fj = fj.reshape(B, M, K, -1)
        out = _reduce(fj, self.reduction)
        post = chans[num_preconv:]
        for i, c in enumerate(post):
            last = i == len(post) - 1
            out = nn.Dense(c, use_bias=False, name=f"post_{i}")(out)
            out = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                               epsilon=1e-5, name=f"post_bn_{i}")(out)
            if not (self.use_res and last):
                out = nn.relu(out)
        if self.use_res:
            if skip.shape[-1] != out.shape[-1]:
                skip = nn.Dense(out.shape[-1], use_bias=False, name="skip")(skip)
            out = nn.relu(out + skip)
        return out


class LocalAggregation(nn.Module):
    """Local aggregation dispatch (reference ``local_aggregation.py:246``):
    ``convpool`` (group -> assemble -> SharedMLP -> reduce) or ``assa``."""

    channels: Sequence[int]          # mlp output channels (excl. input)
    group_args: dict
    feature_type: str = "dp_fj"
    reduction: str = "max"
    aggr_type: str = "convpool"
    use_res: bool = True

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_features,
                 training: bool = False):
        if self.aggr_type.lower() == "assa" or self.feature_type == "assa":
            return ASSA(self.channels, self.group_args, self.reduction,
                        self.use_res, name="assa")(
                query_xyz, support_xyz, support_features, training=training)
        grouper = create_grouper(self.group_args)
        dp, fj = grouper(query_xyz, support_xyz, support_features)
        f_center = None
        if "df" in self.feature_type or "fi" in self.feature_type:
            # center features = support features at the query points; callers
            # that need df pass query_xyz == support_xyz subsets upstream.
            f_center = support_features[:, : query_xyz.shape[1]]
        fj = get_aggregation_features(query_xyz, dp, f_center, fj, self.feature_type)
        fj = SharedMLP(self.channels, name="convs")(fj, training=training)
        return _reduce(fj, self.reduction)
