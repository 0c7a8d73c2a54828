"""Votenet-era PointNet++ set-abstraction modules
(reference: ``pointnet2/pointnet2_modules.py:161-579,644-722``).

The reference ships four "Votes" SA variants (they additionally return the
sampled point indices so a detection head can look up per-seed GT votes) and
a learnable feature-propagation module.  None are on the GeoT training path,
but they are part of the public ``pointnet2`` surface.  Channels-last
``(B, N, C)`` like the rest of the zoo; ``npoint`` is an absolute output
size (static), matching the reference.

Reference's ``sample_uniformly`` re-fills duplicate ball-query slots with
*random* picks among the unique in-ball points
(``pointnet2_utils.py:333-342``); here the fill is the same uniques cycled
deterministically — identical coverage statistics, fixed shapes, no rng
plumbing through jit.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import ball_query, fps, gather_points, grouping_operation
from ..layers.common import SharedMLP

_BIG = jnp.int32(2 ** 30)


def unique_fill(idx):
    """Fixed-shape equivalent of the reference's per-ball unique+refill
    (``pointnet2_utils.py:333-342``): returns ``(filled, unique_cnt)`` where
    ``filled[..., :u]`` are the unique indices (ascending) and the remaining
    slots cycle through them; ``unique_cnt`` is ``u`` per ball.

    Args:  idx (B, M, K) int32.
    """
    s = jnp.sort(idx, axis=-1)
    isnew = jnp.concatenate(
        [jnp.ones(s.shape[:-1] + (1,), bool), s[..., 1:] != s[..., :-1]], -1)
    unique_cnt = jnp.sum(isnew, axis=-1).astype(jnp.int32)      # (B, M)
    uniques = jnp.sort(jnp.where(isnew, s, _BIG), axis=-1)      # uniques first
    k = jnp.arange(idx.shape[-1], dtype=jnp.int32)
    slot = k % unique_cnt[..., None]
    filled = jnp.take_along_axis(uniques, slot, axis=-1)
    return filled.astype(jnp.int32), unique_cnt


def _pool(new_features, grouped_xyz, pooling: str, sigma, nsample):
    """Neighbour-axis pooling (reference ``pointnet2_modules.py:252-264``).
    new_features (B, M, K, C); grouped_xyz (B, M, K, 3) centered (and
    radius-normalized when normalize_xyz, matching the reference's rbf input).
    """
    if pooling == "max":
        return jnp.max(new_features, axis=2)
    if pooling == "avg":
        return jnp.mean(new_features, axis=2)
    if pooling == "rbf":
        rbf = jnp.exp(-jnp.sum(grouped_xyz ** 2, -1) / (sigma ** 2) / 2)
        return jnp.sum(new_features * rbf[..., None], axis=2) / float(nsample)
    raise ValueError(f"unknown pooling {pooling!r}")


class PointnetSAModuleVotes(nn.Module):
    """Single-scale SA with index passthrough/return
    (reference ``pointnet2_modules.py:273-380``).

    ``mlp`` keeps the reference spec (``mlp[0]`` = feature input channels,
    without the implicit +3 the reference adds for ``use_xyz`` — input width
    is inferred).  Returns ``(new_xyz, new_features, inds)`` and additionally
    ``unique_cnt`` when ``ret_unique_cnt``.
    """

    mlp: Sequence[int]
    npoint: Optional[int] = None
    radius: Optional[float] = None
    nsample: Optional[int] = None
    use_xyz: bool = True
    pooling: str = "max"
    sigma: Optional[float] = None
    normalize_xyz: bool = False
    sample_uniformly: bool = False
    ret_unique_cnt: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, training: bool = False):
        sigma = self.sigma if self.sigma is not None else (
            self.radius / 2 if self.radius is not None else None)
        unique_cnt = None
        if self.npoint is not None:
            if inds is None:
                inds = fps(xyz, self.npoint)
            new_xyz = gather_points(xyz, inds)
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            if self.sample_uniformly:
                idx, unique_cnt = unique_fill(idx)
            grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / self.radius
            grouped = (grouping_operation(features, idx)
                       if features is not None else None)
        else:
            # GroupAll (reference ``pointnet2_utils.py:376-422``)
            new_xyz = None
            grouped_xyz = xyz[:, None, :, :]
            grouped = features[:, None, :, :] if features is not None else None
        if self.use_xyz:
            grouped = grouped_xyz if grouped is None else jnp.concatenate(
                [grouped_xyz, grouped], -1)
        new_features = SharedMLP(tuple(self.mlp[1:]), name="mlp_module")(
            grouped, training=training)
        new_features = _pool(new_features, grouped_xyz, self.pooling, sigma,
                             self.nsample)
        if not self.ret_unique_cnt:
            return new_xyz, new_features, inds
        return new_xyz, new_features, inds, unique_cnt


class PointnetSAModuleVotes_nofps(nn.Module):
    """Pre-grouped SA variant: sampling + grouping already done upstream
    (reference ``pointnet2_modules.py:161-270`` — the grouper is bypassed and
    the input is consumed as the grouped tensor directly).

    Input ``xyz`` is the grouped neighbourhood tensor ``(B, npoint, nsample,
    C)`` (the reference permutes its ``(B, npoint, nsample, C)`` input to
    channels-first; channels-last needs no permute).  Mirroring the
    reference, ``new_xyz`` echoes the input and ``unique_cnt`` echoes the
    grouped tensor.
    """

    mlp: Sequence[int]
    npoint: Optional[int] = None
    radius: Optional[float] = None
    nsample: Optional[int] = None
    use_xyz: bool = True
    pooling: str = "max"
    sigma: Optional[float] = None
    normalize_xyz: bool = False
    sample_uniformly: bool = False
    ret_unique_cnt: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, training: bool = False):
        sigma = self.sigma if self.sigma is not None else (
            self.radius / 2 if self.radius is not None else None)
        grouped = xyz                                    # (B, M, K, C)
        new_features = SharedMLP(tuple(self.mlp[1:]), name="mlp_module")(
            grouped, training=training)
        new_features = _pool(new_features, grouped, self.pooling, sigma,
                             self.nsample)
        if not self.ret_unique_cnt:
            return xyz, new_features, inds
        return xyz, new_features, inds, grouped


class PointnetSAModuleVotes_nogrouping(nn.Module):
    """SA variant with sampling but no neighbourhood: features are already at
    the sampled resolution; a zero xyz block is prepended and the MLP runs
    pointwise (reference ``pointnet2_modules.py:383-498``)."""

    mlp: Sequence[int]
    npoint: Optional[int] = None
    radius: Optional[float] = None
    nsample: Optional[int] = None
    use_xyz: bool = True
    pooling: str = "max"
    sigma: Optional[float] = None
    normalize_xyz: bool = False
    sample_uniformly: bool = False
    ret_unique_cnt: bool = False

    @nn.compact
    def __call__(self, xyz, features, inds=None, training: bool = False):
        if inds is None:
            inds = fps(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds) if self.npoint is not None else None
        # reference ``pointnet2_modules.py:470-474``: zeros stand in for the
        # (use_xyz) coordinate channels; K=1, so pooling is a no-op squeeze
        feats = jnp.concatenate([jnp.zeros_like(new_xyz), features], -1)
        new_features = SharedMLP(tuple(self.mlp[1:]), name="mlp_module")(
            feats, training=training)
        if not self.ret_unique_cnt:
            return new_xyz, new_features, inds
        return new_xyz, new_features, inds, None


class PointnetSAModuleMSGVotes(nn.Module):
    """Multi-scale-grouping SA with index passthrough/return
    (reference ``pointnet2_modules.py:500-579``).  ``mlps[i][0]`` is the
    feature input width of scale i (reference convention); outputs are
    concatenated over scales."""

    mlps: Sequence[Sequence[int]]
    npoint: Optional[int] = None
    radii: Sequence[float] = ()
    nsamples: Sequence[int] = ()
    use_xyz: bool = True
    sample_uniformly: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, training: bool = False):
        assert len(self.mlps) == len(self.radii) == len(self.nsamples)
        if inds is None:
            inds = fps(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds) if self.npoint is not None else None
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            idx = ball_query(radius, nsample, xyz, new_xyz)
            if self.sample_uniformly:
                idx, _ = unique_fill(idx)
            grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
            grouped = (grouping_operation(features, idx)
                       if features is not None else None)
            if self.use_xyz:
                grouped = grouped_xyz if grouped is None else jnp.concatenate(
                    [grouped_xyz, grouped], -1)
            f = SharedMLP(tuple(mlp[1:]), name=f"mlp_{i}")(grouped,
                                                           training=training)
            outs.append(jnp.max(f, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class PointnetLFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation from ``xyz1`` onto ``xyz2``
    (reference ``pointnet2_modules.py:644-722``): per scale, ball-group
    ``features1`` at the ``xyz2`` queries, MLP + max-pool, concat the
    destination's own ``features2``, then a shared post-MLP; scale outputs
    are concatenated."""

    mlps: Sequence[Sequence[int]]
    radii: Sequence[float] = ()
    nsamples: Sequence[int] = ()
    post_mlp: Sequence[int] = ()
    use_xyz: bool = True
    sample_uniformly: bool = False

    @nn.compact
    def __call__(self, xyz2, xyz1, features2, features1,
                 training: bool = False):
        assert len(self.mlps) == len(self.radii) == len(self.nsamples)
        post = SharedMLP(tuple(self.post_mlp[1:]), name="post_mlp")
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            idx = ball_query(radius, nsample, xyz1, xyz2)
            if self.sample_uniformly:
                idx, _ = unique_fill(idx)
            grouped_xyz = grouping_operation(xyz1, idx) - xyz2[:, :, None, :]
            grouped = (grouping_operation(features1, idx)
                       if features1 is not None else None)
            if self.use_xyz:
                grouped = grouped_xyz if grouped is None else jnp.concatenate(
                    [grouped_xyz, grouped], -1)
            f = SharedMLP(tuple(mlp[1:]), name=f"mlp_{i}")(grouped,
                                                           training=training)
            f = jnp.max(f, axis=2)                               # (B, N2, C)
            if features2 is not None:
                f = jnp.concatenate([f, features2], axis=-1)
            outs.append(post(f, training=training))
        return jnp.concatenate(outs, axis=-1)
