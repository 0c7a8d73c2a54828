"""Configurable MLP blocks (reference ``openpoints/models/layers/mlp.py`` —
timm's Mlp/GluMlp/GatedMlp/ConvMlp with the openpoints ``act_args`` surface).

Channels-last collapses the torch layout split: ``ConvMlp`` (1x1 Conv2d on
NCHW) and ``Mlp`` (Linear) are the same trailing-axis Dense here; ``ConvMlp``
keeps its distinct structure (norm after fc1, single dropout, no final drop)
for parity.  ``in_features`` is accepted for signature parity and ignored —
flax infers input width at call time.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .factories import create_act, create_norm
from .helpers import to_2tuple


class Mlp(nn.Module):
    """fc1 -> act -> drop -> fc2 -> drop (reference ``mlp.py:11-35``)."""

    in_features: Optional[int] = None
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act_args: Any = None            # default gelu, as the reference
    drop: Any = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = self.out_features or self.in_features or x.shape[-1]
        hidden = self.hidden_features or self.in_features or x.shape[-1]
        act = create_act(self.act_args if self.act_args is not None
                         else {"act": "gelu"})
        d1, d2 = to_2tuple(self.drop)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dropout(d1, deterministic=not training)(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(d2, deterministic=not training)(x)
        return x


class GluMlp(nn.Module):
    """GLU-gated MLP (reference ``mlp.py:38-70``): fc1 doubles the hidden
    width, the second half gates the first through ``act`` (sigmoid default)."""

    in_features: Optional[int] = None
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act_args: Any = None            # default sigmoid, as the reference
    drop: Any = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = self.out_features or self.in_features or x.shape[-1]
        hidden = self.hidden_features or self.in_features or x.shape[-1]
        assert hidden % 2 == 0, "GluMlp hidden width must be even"
        act = create_act(self.act_args if self.act_args is not None
                         else {"act": "sigmoid"})
        d1, d2 = to_2tuple(self.drop)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x, gates = x[..., : hidden // 2], x[..., hidden // 2:]
        x = x * act(gates)
        x = nn.Dropout(d1, deterministic=not training)(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(d2, deterministic=not training)(x)
        return x


class GatedMlp(nn.Module):
    """gMLP block (reference ``mlp.py:73-103``): optional ``gate_layer``
    (a module/callable halving the hidden width) between the dropouts."""

    in_features: Optional[int] = None
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act_args: Any = None            # default gelu
    gate_layer: Any = None
    drop: Any = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = self.out_features or self.in_features or x.shape[-1]
        hidden = self.hidden_features or self.in_features or x.shape[-1]
        act = create_act(self.act_args if self.act_args is not None
                         else {"act": "gelu"})
        d1, d2 = to_2tuple(self.drop)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dropout(d1, deterministic=not training)(x)
        if self.gate_layer is not None:
            assert hidden % 2 == 0
            x = self.gate_layer(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(d2, deterministic=not training)(x)
        return x


class ConvMlp(nn.Module):
    """1x1-conv MLP (reference ``mlp.py:106-129``): fc1 -> norm -> act ->
    drop -> fc2; channels-last Dense carries the 1x1 conv."""

    in_features: Optional[int] = None
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act_args: Any = None            # default gelu
    norm_args: Any = None
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = self.out_features or self.in_features or x.shape[-1]
        hidden = self.hidden_features or self.in_features or x.shape[-1]
        act = create_act(self.act_args if self.act_args is not None
                         else {"act": "gelu"})
        norm = create_norm(self.norm_args, hidden)
        x = nn.Dense(hidden, use_bias=True, dtype=self.dtype, name="fc1")(x)
        if norm is not None:
            from .common import PointBatchNorm

            x = norm(x, training=training) if isinstance(norm, PointBatchNorm) \
                else norm(x)
        x = act(x)
        x = nn.Dropout(self.drop, deterministic=not training)(x)
        x = nn.Dense(out, use_bias=True, dtype=self.dtype, name="fc2")(x)
        return x
