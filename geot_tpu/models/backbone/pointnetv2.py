"""PointNet++ encoder/decoder (reference: ``openpoints/models/backbone/pointnetv2.py``).

Set-abstraction (SA) stages with multi-scale grouping + feature-propagation
(FP) decoder, as flax modules over ``geot_tpu.ops``.  Channels-last.  The
config surface mirrors the reference (``in_channels, radius, num_samples,
mlps | width/strides/layers, aggr_args, group_args, ...``) so openpoints-style
YAML encoder_args build unchanged.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import fps, gather_points, three_interpolation
from ..build import MODELS
from ..layers.common import SharedMLP
from ..layers.local_aggregation import LocalAggregation


def _to_full_list(param, blocks, strides, param_scaling=1, block_param_scaling=1):
    """Expand scalar/partial radius/nsample specs to per-stage-per-block lists
    (reference ``pointnetv2.py:289-307``)."""
    param_list = []
    if isinstance(param, (list, tuple)):
        for i, value in enumerate(param):
            value = list(value) if isinstance(value, (list, tuple)) else [value]
            if len(value) != blocks[i]:
                value += [value[-1]] * (blocks[i] - len(value))
            param_list.append(value)
    else:
        for i, stride in enumerate(strides):
            if stride == 1:
                param_list.append([param] * blocks[i])
            else:
                param_list.append([param] + [param * block_param_scaling] * (blocks[i] - 1))
                param *= param_scaling
    return param_list


class PointNetSAModuleMSG(nn.Module):
    """SA stage: fps downsample once, then one local aggregation per scale,
    concatenated (reference ``pointnetv2.py:18-101``)."""

    stride: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    channel_list: Sequence[Sequence[int]]   # per-scale mlp channels (incl. input)
    feature_type: str = "dp_fj"
    reduction: str = "max"

    @nn.compact
    def __call__(self, support_xyz, support_features, training: bool = False):
        if self.stride > 1:
            idx = fps(support_xyz, support_xyz.shape[1] // self.stride)
            query_xyz = gather_points(support_xyz, idx)
        else:
            query_xyz = support_xyz
        outs = []
        for i, (radius, nsample, channels) in enumerate(
                zip(self.radii, self.nsamples, self.channel_list)):
            group_args = {"NAME": "ballquery", "radius": radius, "nsample": nsample}
            f = LocalAggregation(list(channels)[1:], group_args,
                                 self.feature_type, self.reduction,
                                 name=f"la_{i}")(query_xyz, support_xyz,
                                                 support_features,
                                                 training=training)
            outs.append(f)
        return query_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFPModule(nn.Module):
    """FP: three_nn interpolate + skip concat + pointwise MLP
    (reference ``pointnetv2.py:103-148``)."""

    mlp: Sequence[int]               # output channels per layer (input inferred)

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 training: bool = False):
        interp = three_interpolation(unknown, known, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([unknown_feats, interp], axis=-1)
        return SharedMLP(self.mlp, name="convs")(interp, training=training)


# reference-name aliases: top-level ``pointnet2.pointnet2_modules`` spellings
# (``pointnet2_modules.py:24,582``) and the pointnet2-package FP name
PointnetSAModuleMSG = PointNetSAModuleMSG
PointnetFPModule = PointNetFPModule
PointNetFeaturePropagation = PointNetFPModule


def PointnetSAModule(mlp, npoint=None, radius=None, nsample=None,
                     stride: int | None = None, **kwargs):
    """Single-scale SA module (reference ``pointnet2_modules.py:24-56``) —
    the MSG module with one (radius, nsample, mlp) scale.  ``npoint`` is the
    reference's absolute output size; under fixed input sizes the flax module
    takes the equivalent ``stride`` (pass it directly, or ``npoint`` together
    with the known input size via ``stride = N // npoint``)."""
    if stride is None:
        if npoint is not None:
            raise ValueError(
                "npoint is an absolute output size; the shape-agnostic flax "
                "module needs the ratio — pass stride=N // npoint instead")
        stride = 1
    return PointNetSAModuleMSG(stride=stride, radii=[radius],
                               nsamples=[nsample], channel_list=[list(mlp)],
                               **kwargs)


@MODELS.register_module(name="PointNet2Encoder")
class PointNet2Encoder(nn.Module):
    """Hierarchical encoder (reference ``pointnetv2.py:150-348``).

    Either pass ``mlps`` explicitly (list of stages, each a list of per-scale
    channel lists) or derive from ``width``/``layers``/``strides``.
    """

    in_channels: int = 3
    radius: Any = 0.1
    num_samples: Any = 32
    aggr_args: Any = None
    group_args: Any = None
    conv_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    blocks: Optional[Sequence[int]] = None
    mlps: Any = None
    width: Optional[int] = None
    strides: Sequence[int] = (4, 4, 4, 4)
    layers: int = 3
    width_scaling: int = 2
    radius_scaling: int = 2
    block_radius_scaling: int = 1
    nsample_scaling: int = 1
    sampler: str = "fps"
    use_res: bool = False
    stem_conv: bool = False
    stem_aggr: bool = False
    double_last_channel: bool = True
    query_as_support: bool = False

    def _build_plan(self):
        stages = len(self.strides)
        blocks = self.blocks if self.mlps is None else [len(m) for m in self.mlps]
        blocks = blocks or [1] * stages
        radius = _to_full_list(self.radius, blocks, self.strides,
                               self.radius_scaling, self.block_radius_scaling)
        nsamples = _to_full_list(self.num_samples, blocks, self.strides,
                                 self.nsample_scaling)
        mlps = self.mlps
        if mlps is None:
            width = self.width
            mlps = []
            for i in range(stages):
                if not self.double_last_channel:
                    mlps.append([[width] * self.layers] * blocks[i])
                    width = width * self.width_scaling if self.strides[i] > 1 else width
                else:
                    tmp = [width] * (self.layers - 1)
                    width = width * self.width_scaling if self.strides[i] > 1 else width
                    tmp += [width]
                    mlps.append([tmp] + [[width] * self.layers] * (blocks[i] - 1))
        return blocks, radius, nsamples, mlps

    @property
    def channel_list(self) -> List[int]:
        """Per-level output widths [in, stage1, ..], consumed by the decoder."""
        _, _, _, mlps = self._build_plan()
        chans = [self.in_channels]
        for stage in mlps:
            chans.append(sum(m[-1] for m in stage))
        return chans

    @property
    def out_channels(self) -> int:
        return self.channel_list[-1]

    def __call__(self, xyz, features=None, training: bool = False):
        return self.forward_seg_feat(xyz, features, training=training)

    @nn.compact
    def forward_seg_feat(self, xyz, features=None, training: bool = False):
        if features is None:
            features = xyz
        _, radius, nsamples, mlps = self._build_plan()
        feature_type = (self.aggr_args or {}).get("feature_type", "dp_fj")
        reduction = (self.aggr_args or {}).get("reduction", "max")
        l_xyz, l_feats = [xyz], [features]
        in_ch = features.shape[-1]
        for k, stride in enumerate(self.strides):
            channel_list = [[in_ch] + list(m) for m in mlps[k]]
            sa = PointNetSAModuleMSG(stride=stride, radii=tuple(radius[k]),
                                     nsamples=tuple(nsamples[k]),
                                     channel_list=tuple(tuple(c) for c in channel_list),
                                     feature_type=feature_type,
                                     reduction=reduction,
                                     name=f"sa_{k}")
            new_xyz, new_f = sa(l_xyz[-1], l_feats[-1], training=training)
            l_xyz.append(new_xyz)
            l_feats.append(new_f)
            in_ch = new_f.shape[-1]
        return l_xyz, l_feats

    def forward_cls_feat(self, xyz, features=None, training: bool = False):
        l_xyz, l_feats = self.forward_seg_feat(xyz, features, training=training)
        return jnp.max(l_feats[-1], axis=1)


@MODELS.register_module(name="PointNet2Decoder")
class PointNet2Decoder(nn.Module):
    """FP decoder walking the pyramid back up
    (reference ``pointnetv2.py:351-383``)."""

    encoder_channel_list: Sequence[int]
    fp_mlps: Any = None
    decoder_layers: int = 1

    @nn.compact
    def __call__(self, l_xyz, l_features, training: bool = False):
        skip = list(self.encoder_channel_list)
        fp_mlps = self.fp_mlps
        if fp_mlps is None:
            fp_mlps = [[skip[1]] * (self.decoder_layers + 1)]
            fp_mlps += [[c] * (self.decoder_layers + 1) for c in skip[1:-1]]
        l_features = list(l_features)
        n = len(fp_mlps)
        for i in range(-1, -(n + 1), -1):
            l_features[i - 1] = PointNetFPModule(tuple(fp_mlps[i]), name=f"fp_{n + i}")(
                l_xyz[i - 1], l_xyz[i], l_features[i - 1], l_features[i],
                training=training)
        return l_features[0]


@MODELS.register_module(name="PointNet2PartDecoder")
class PointNet2PartDecoder(nn.Module):
    """Part-seg FP decoder with jaw/category one-hot injection at the final
    level (reference ``pointnetv2.py:384-512``)."""

    encoder_channel_list: Sequence[int]
    shape_classes: int = 16
    fp_mlps: Any = None
    decoder_layers: int = 1

    @nn.compact
    def __call__(self, l_xyz, l_features, cls_label=None, training: bool = False):
        skip = list(self.encoder_channel_list)
        fp_mlps = self.fp_mlps
        if fp_mlps is None:
            fp_mlps = [[skip[1]] * (self.decoder_layers + 1)]
            fp_mlps += [[c] * (self.decoder_layers + 1) for c in skip[1:-1]]
        l_features = list(l_features)
        n = len(fp_mlps)
        for i in range(-1, -(n + 1), -1):
            unknown_feats = l_features[i - 1]
            if i - 1 == -len(l_features) and cls_label is not None:
                B, N0 = l_xyz[0].shape[:2]
                onehot = jax.nn.one_hot(cls_label.reshape(-1),
                                        self.shape_classes)
                onehot = jnp.broadcast_to(onehot[:, None, :],
                                          (B, N0, self.shape_classes))
                unknown_feats = jnp.concatenate([unknown_feats, onehot], -1)
            l_features[i - 1] = PointNetFPModule(tuple(fp_mlps[i]),
                                                 name=f"fp_{n + i}")(
                l_xyz[i - 1], l_xyz[i], unknown_feats, l_features[i],
                training=training)
        return l_features[0]


@MODELS.register_module(name="PointNet2GenEncoder")
class PointNet2GenEncoder(PointNet2Encoder):
    """PointNet2Encoder variant for the generation stack: forward_cls_feat
    returns (coarsest features, coarsest coords) (reference ``pointnetv2.py:515``)."""

    def forward_cls_feat(self, xyz, features=None, training: bool = False):
        l_xyz, l_feats = self.forward_seg_feat(xyz, features, training=training)
        return l_feats[-1], l_xyz[-1]
