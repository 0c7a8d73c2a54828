"""PointMLP encoder (reference: ``openpoints/models/backbone/pointmlp.py:295-475``).

Residual-MLP point backbone: per-stage fps + kNN grouping with a learnable
geometric-affine normalisation, per-group residual MLP extraction (max-pooled),
then per-point residual MLPs.  Channels-last flax.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import fps, gather_points, grouping_operation, knn
from ..build import MODELS


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances (B, N, M) — reference name
    (``backbone/pointmlp.py:45``) for ``ops.knn.pairwise_dist2``."""
    from ...ops.knn import pairwise_dist2

    return pairwise_dist2(src, dst)


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


def pointMLP(**kwargs) -> PointMLPEncoder:
    """Original PointMLP config (reference ``pointmlp.py:461-465``); the
    torch-only knobs (groups/activation/num_classes) are fixed here."""
    kwargs.pop("num_classes", None)
    return PointMLPEncoder(embed_dim=64, res_expansion=1.0, bias=False,
                           use_xyz=False, normalize="anchor",
                           dim_expansion=(2, 2, 2, 2), pre_blocks=(2, 2, 2, 2),
                           pos_blocks=(2, 2, 2, 2),
                           k_neighbors=(24, 24, 24, 24),
                           reducers=(2, 2, 2, 2), **kwargs)


def pointMLPElite(**kwargs) -> PointMLPEncoder:
    """Elite (slim) PointMLP config (reference ``pointmlp.py:468-472``)."""
    kwargs.pop("num_classes", None)
    return PointMLPEncoder(embed_dim=32, res_expansion=0.25, bias=False,
                           use_xyz=False, normalize="anchor",
                           dim_expansion=(2, 2, 2, 1), pre_blocks=(1, 1, 2, 1),
                           pos_blocks=(1, 1, 2, 1),
                           k_neighbors=(24, 24, 24, 24),
                           reducers=(2, 2, 2, 2), **kwargs)


@MODELS.register_module(name="PointMLPPartSegmentor")
class PointMLPPartSegmentor(nn.Module):
    """PointMLP part-segmentation network (reference
    ``openpoints/models/backbone/pointmlp_seg.py:349``): residual-MLP encoder
    pyramid + three_nn FP decoder with global max-pool and category-token
    conditioning, per-point head."""

    num_classes: int = 17
    shape_classes: int = 2
    embed_dim: int = 64
    res_expansion: float = 1.0
    bias: bool = True
    use_xyz: bool = True
    normalize: str = "anchor"
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    k_neighbors: Sequence[int] = (32, 32, 32, 32)
    reducers: Sequence[int] = (4, 4, 4, 4)
    de_dims: Sequence[int] = (512, 256, 128, 128)
    de_blocks: Sequence[int] = (2, 2, 2, 2)
    gmp_dim: int = 64
    cls_dim: int = 64

    @nn.compact
    def __call__(self, pts, features=None, cls_label=None,
                 training: bool = False):
        from ...ops import three_interpolation

        if hasattr(pts, "keys"):     # engine dict batches (like BasePartSeg)
            pts, features, cls_label = (pts["pos"], pts.get("x"),
                                        pts.get("cls"))
        if features is None:
            features = pts
        x = ConvBNReLU(self.embed_dim, self.bias, name="embedding")(features,
                                                                    training=training)
        xyz = pts
        l_xyz, l_feats = [xyz], [x]
        last = self.embed_dim
        for i in range(len(self.pre_blocks)):
            out = last * self.dim_expansion[i]
            xyz, grouped = LocalGrouper(last, self.reducers[i],
                                        self.k_neighbors[i], self.use_xyz,
                                        self.normalize,
                                        name=f"grouper_{i}")(xyz, l_feats[-1])
            h = PreExtraction(out, self.pre_blocks[i], self.res_expansion,
                              self.bias, name=f"pre_{i}")(grouped, training=training)
            h = PosExtraction(out, self.pos_blocks[i], self.res_expansion,
                              self.bias, name=f"pos_{i}")(h, training=training)
            l_xyz.append(xyz)
            l_feats.append(h)
            last = out

        # FP decoder back to full resolution
        f = l_feats[-1]
        for i in range(len(self.de_dims)):
            up = three_interpolation(l_xyz[-(i + 2)], l_xyz[-(i + 1)], f)
            f = jnp.concatenate([up, l_feats[-(i + 2)]], axis=-1)
            for j in range(self.de_blocks[i]):
                f = ConvBNReLU(self.de_dims[i], self.bias,
                               name=f"de_{i}_{j}")(f, training=training)

        # global max-pool token + category token conditioning
        gmp = ConvBNReLU(self.gmp_dim, self.bias, name="gmp")(f, training=training)
        gmp = jnp.max(gmp, axis=1, keepdims=True)
        if cls_label is None:
            cls_label = jnp.zeros((pts.shape[0],), jnp.int32)
        onehot = jax.nn.one_hot(cls_label.reshape(-1), self.shape_classes)
        cls_tok = ConvBNReLU(self.cls_dim, self.bias,
                             name="cls_map")(onehot[:, None, :], training=training)
        cond = jnp.concatenate([jnp.broadcast_to(gmp, f.shape[:2] + (self.gmp_dim,)),
                                jnp.broadcast_to(cls_tok, f.shape[:2] + (self.cls_dim,)),
                                f], axis=-1)
        h = ConvBNReLU(128, self.bias, name="head0")(cond, training=training)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return nn.Dense(self.num_classes, name="head1")(h)


@MODELS.register_module(name="PointMLPGenEncoder")
class PointMLPGenEncoder(nn.Module):
    """PointMLP encoder that keeps per-group tokens (no global pool) for the
    generation/pretraining stack (reference ``pointmlp.py:476-540``):
    ``forward_cls_feat`` returns ``(tokens (B,G,C), centers (B,G,3))`` — the
    (feats, coords) pair ``ViewGenBase`` feeds to the photo generator."""

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
        if hasattr(xyz, "keys"):
            xyz, features = xyz["pos"], xyz.get("x")
        if features is None:
            features = xyz
        x = ConvBNReLU(self.embed_dim, self.bias, name="embedding")(
            features, training=training)
        last = self.embed_dim
        for i in range(len(self.pre_blocks)):
            out = last * self.dim_expansion[i]
            xyz, grouped = LocalGrouper(last, self.reducers[i],
                                        self.k_neighbors[i], self.use_xyz,
                                        self.normalize,
                                        name=f"grouper_{i}")(xyz, x)
            x = PreExtraction(out, self.pre_blocks[i], self.res_expansion,
                              self.bias, name=f"pre_{i}")(grouped,
                                                          training=training)
            x = PosExtraction(out, self.pos_blocks[i], self.res_expansion,
                              self.bias, name=f"pos_{i}")(x, training=training)
            last = out
        return x, xyz                                       # tokens, centers

    def forward_cls_feat(self, xyz, features=None, training: bool = False):
        return self(xyz, features, training=training)


@MODELS.register_module(name="PointMLPEncoderV2")
class PointMLPEncoderV2(nn.Module):
    """PointMLP encoder with a coordinate-aware feature MLP before the global
    pool (reference ``pointmlp.py:354-420``): the final per-group features are
    concatenated with their centers, mapped by an Mlp to ``feat_channels``,
    then max-pooled to a single vector."""

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
    feat_channels: int = 0          # 0 -> last stage width

    @nn.compact
    def __call__(self, xyz, features=None, training: bool = False):
        if hasattr(xyz, "keys"):
            xyz, features = xyz["pos"], xyz.get("x")
        x, xyz = PointMLPGenEncoder(
            self.in_channels, self.embed_dim, self.res_expansion, self.bias,
            self.use_xyz, self.normalize, self.dim_expansion, self.pre_blocks,
            self.pos_blocks, self.k_neighbors, self.reducers,
            name="enc")(xyz, features, training=training)
        out = self.feat_channels or x.shape[-1]
        # timm-style Mlp: fc1 -> GELU -> fc2 (reference feat_mlp)
        h = nn.Dense(out, name="feat_mlp_fc1")(
            jnp.concatenate([x, xyz], axis=-1))
        h = nn.Dense(out, name="feat_mlp_fc2")(nn.gelu(h, approximate=False))
        return jnp.max(h, axis=1)                               # (B, C)

    def forward_cls_feat(self, xyz, features=None, training: bool = False):
        return self(xyz, features, training=training)


@MODELS.register_module(name="PointMLP")
def PointMLP(**kwargs):
    """Classification PointMLP (reference ``pointmlp.py:420``): encoder +
    max-pool handled by BaseCls; alias to the encoder for registry parity."""
    fields = PointMLPEncoder.__dataclass_fields__
    return PointMLPEncoder(**{k: v for k, v in kwargs.items() if k in fields})


def get_activation(activation: str):
    """Activation-by-name helper with the reference's pointMLP spellings
    (reference ``backbone/pointmlp.py:28-50``); returns a jax callable."""
    name = activation.lower()
    table = {"gelu": lambda x: jax.nn.gelu(x, approximate=False),
             "rrelu": jax.nn.leaky_relu,   # eval-mode RReLU == fixed slope
             "selu": jax.nn.selu, "silu": jax.nn.silu,
             "hardswish": jax.nn.hard_swish, "relu": jax.nn.relu,
             "leakyrelu": jax.nn.leaky_relu,
             "leakyrelu0.2": lambda x: jax.nn.leaky_relu(x, 0.2)}
    if name not in table:
        raise ValueError(f"activation {activation} unsupported "
                         f"(known: {sorted(table)})")
    return table[name]


def query_ball_point(radius, nsample, xyz, new_xyz):
    """Reference-name wrapper (``backbone/pointmlp.py:61-81``) over
    ``ops.ball_query``: returns grouped indices (B, S, nsample)."""
    from ...ops import ball_query

    return ball_query(radius, nsample, xyz, new_xyz)


# reference spelling (``pointmlp.py:53``: its local torch farthest_point_sample)
ConvBNReLU1D = ConvBNReLU
