"""DGCNN backbone (reference: ``openpoints/models/backbone/dgcnn.py:13-108``).

Edge-conv graph network: kNN graph in coordinate space for the head, dynamic
kNN in feature space for subsequent blocks; per-block channels double; all
block outputs are concatenated and fused.  Channels-last flax over the
blockwise TPU kNN.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops import grouping_operation, knn
from ..build import MODELS

leaky = lambda x: nn.leaky_relu(x, negative_slope=0.2)  # noqa: E731


class EdgeConv(nn.Module):
    """max_k MLP([x_i ; x_j - x_i]) — the ``GraphConv``/``DynConv`` edge
    aggregation (reference ``openpoints/models/layers/graph_conv.py``)."""

    channels: int

    @nn.compact
    def __call__(self, feats, idx, training: bool = False):
        # feats (B, N, C), idx (B, N, K)
        neigh = grouping_operation(feats, idx)
        center = jnp.broadcast_to(feats[:, :, None, :], neigh.shape)
        edge = jnp.concatenate([center, neigh - center], axis=-1)
        h = nn.Dense(self.channels, use_bias=False, name="conv")(edge)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="bn")(h)
        return jnp.max(leaky(h), axis=2)


@MODELS.register_module(name="DGCNN")
class DGCNN(nn.Module):
    in_channels: int = 3
    channels: int = 64
    embed_dim: int = 1024
    n_blocks: int = 5
    k: int = 20
    is_seg: bool = False

    @nn.compact
    def __call__(self, pts, features=None, training: bool = False):
        if features is None:
            features = pts
        _, idx = knn(pts, pts, self.k)
        feats = [EdgeConv(self.channels, name="head")(features, idx,
                                                      training=training)]
        ch = self.channels
        for i in range(self.n_blocks - 2):
            # dynamic graph: recompute kNN in feature space
            _, fidx = knn(feats[-1], feats[-1], self.k)
            feats.append(EdgeConv(ch, name=f"block_{i}")(feats[-1], fidx,
                                                         training=training))
        fused = jnp.concatenate(feats, axis=-1)
        fused = nn.Dense(self.embed_dim, use_bias=False, name="fusion")(fused)
        fused = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name="fusion_bn")(fused)
        return leaky(fused)

    def forward_seg_feat(self, pts, features=None, training: bool = False):
        return pts, self(pts, features, training=training)

    def forward_cls_feat(self, pts, features=None, training: bool = False):
        fused = self(pts, features, training=training)
        return jnp.concatenate([jnp.max(fused, axis=1), jnp.mean(fused, axis=1)],
                               axis=-1)


@MODELS.register_module(name="DGCNNGenEncoder")
class DGCNNGenEncoder(DGCNN):
    """DGCNN variant for the generation stack (reference ``dgcnn.py:108``):
    forward_cls_feat returns (per-point features, coords)."""

    def forward_cls_feat(self, pts, features=None, training: bool = False):
        fused = self(pts, features, training=training)
        return fused, pts
