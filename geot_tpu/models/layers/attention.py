"""Generic non-hierarchical transformer encoder layer export.

Reference ``openpoints/models/layers/attention.py:61`` (``TransformerEncoder``,
exported at ``layers/__init__.py:13``): a plain ViT block stack that re-injects
the positional embedding before every block, with ``forward_features`` tapping
``num_outs`` dilated intermediate activations.  The blocks are the backbone's
``Block`` modules (same pre-norm attention the reference's layer duplicates
from its backbone file).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from .common import drop_path_rates


def _block():
    # call-time import: the backbone module imports this package's __init__,
    # so a top-level import here would be circular
    from ..backbone.transformer import Block

    return Block


class TransformerEncoder(nn.Module):
    """Transformer encoder without hierarchical structure
    (reference ``layers/attention.py:61-107``)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, training: bool = False, num_outs=None):
        """``num_outs=None``: final activation.  ``num_outs=k``: the
        reference's ``forward_features`` — k dilated taps
        (``layers/attention.py:96-106``)."""
        Block = _block()
        dpr = drop_path_rates(self.drop_path_rate, self.depth)
        if num_outs is not None:
            dilation = self.depth // num_outs
            out_depth = list(range(self.depth))[
                (self.depth - (num_outs - 1) * dilation - 1)::dilation]
        else:
            out_depth = []
        taps = []
        for i in range(self.depth):
            x = Block(self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, drop=self.drop_rate,
                      attn_drop=self.attn_drop_rate, drop_path=dpr[i],
                      dtype=self.dtype, name=f"block_{i}")(
                          x + pos, training=training)
            if i in out_depth:
                taps.append(x)
        return taps if num_outs is not None else x

    def forward_features(self, x, pos, num_outs, training: bool = False):
        return self(x, pos, training=training, num_outs=num_outs)
