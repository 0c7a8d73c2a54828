"""Graph convolution layers (reference ``openpoints/models/layers/graph_conv.py``).

Static/dynamic edge convolutions over kNN graphs, channels-last: features are
``(B, N, C)`` and edge indices ``(B, N, K)`` int32.  The reference keeps a
``(B, C, N, 1)`` layout and builds each layer from ``create_convblock2d``;
here a layer is a pointwise Dense + BN + ReLU (identical math — a 1x1 conv is
a Dense over the channel axis), which XLA fuses into the surrounding gather
arithmetic.

Note: the reference's ``MRConv.forward`` calls the non-existent
``x.unsequence(-1)`` (``graph_conv.py:34``) and would crash if used; this port
implements the intended max-relative aggregation from the DeepGCN paper.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops import grouping_operation
from .knn import DilatedKNN


def gather_features(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Reference ``layers/graph_conv.py:8``: features (B, C, N, 1) + indices
    (B, N, K) -> (B, C, N, K).  Channels-first shim over the channels-last
    ``grouping_operation`` the conv modules here use internally."""
    out = grouping_operation(jnp.swapaxes(features[..., 0], 1, 2), indices)
    return out.transpose(0, 3, 1, 2)


class _ConvBlock(nn.Module):
    """Dense + BN + ReLU (the reference's ``create_convblock2d`` default)."""

    channels: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


class MRConv(nn.Module):
    """Max-Relative graph conv (reference ``graph_conv.py:25-36``; DeepGCN
    arXiv:1904.03751): aggregate ``max_k(x_j - x_i)`` then MLP on
    ``[x_i, aggregate]``."""

    out_channels: int

    @nn.compact
    def __call__(self, x, edge_index, training: bool = False):
        x_j = grouping_operation(x, edge_index)                 # (B, N, K, C)
        rel = jnp.max(x_j - x[:, :, None, :], axis=2)           # (B, N, C)
        return _ConvBlock(self.out_channels, name="nn")(
            jnp.concatenate([x, rel], axis=-1), training=training)


class EdgeConv(nn.Module):
    """Edge convolution (reference ``graph_conv.py:39-51``; DGCNN): MLP on
    ``[x_i, x_j - x_i]`` per edge, max-pooled over neighbours."""

    out_channels: int

    @nn.compact
    def __call__(self, x, edge_index, training: bool = False):
        x_j = grouping_operation(x, edge_index)                 # (B, N, K, C)
        xi = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
        h = _ConvBlock(self.out_channels, name="nn")(
            jnp.concatenate([xi, x_j - xi], axis=-1), training=training)
        return jnp.max(h, axis=2)                               # (B, N, C_out)


_GCN_LAYERS = {"mrconv": MRConv, "edgeconv": EdgeConv, "edge": EdgeConv}


class GraphConv(nn.Module):
    """Static graph conv dispatching on conv name
    (reference ``graph_conv.py:61-73``)."""

    out_channels: int
    conv: Any = "edge"

    @nn.compact
    def __call__(self, x, edge_index, training: bool = False):
        cls = _GCN_LAYERS[self.conv] if isinstance(self.conv, str) else self.conv
        return cls(self.out_channels, name="gconv")(x, edge_index,
                                                    training=training)


class DynConv(nn.Module):
    """Dynamic graph conv: rebuild the dilated kNN graph in feature space
    every call (reference ``graph_conv.py:76-89``)."""

    out_channels: int
    conv: Any = "edge"
    k: int = 9
    dilation: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        _, edge_index = DilatedKNN(self.k, self.dilation)(x)
        cls = _GCN_LAYERS[self.conv] if isinstance(self.conv, str) else self.conv
        return cls(self.out_channels, name="gconv")(x, edge_index,
                                                    training=training)


class ResDynBlock(nn.Module):
    """Residual dynamic graph conv block (reference ``graph_conv.py:92-103``)."""

    channels: int
    conv: Any = "edge"
    k: int = 9
    dilation: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        return DynConv(self.channels, self.conv, self.k, self.dilation,
                       name="body")(x, training=training) + x


class DenseDynBlock(nn.Module):
    """Densely-connected dynamic graph conv block
    (reference ``graph_conv.py:106-119``): output concatenates the input."""

    in_channels: int
    out_channels: int
    conv: Any = "edge"
    k: int = 9
    dilation: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.out_channels > self.in_channels, \
            "#out channels should be larger than #in channels"
        dense = DynConv(self.out_channels - self.in_channels, self.conv,
                        self.k, self.dilation, name="body")(x, training=training)
        return jnp.concatenate([x, dense], axis=-1)
