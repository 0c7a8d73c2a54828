"""Classification wrappers (reference: ``openpoints/models/classification/cls_base.py:13,47``)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ..build import MODELS, build_model_from_cfg


@MODELS.register_module(name="ClsHead")
class ClsHead(nn.Module):
    """Global-feature classifier head (reference ``cls_base.py`` head build):
    Dense+BN+ReLU+Dropout stack -> num_classes."""

    num_classes: int
    mlps: Sequence[int] = (512, 256)
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i, c in enumerate(self.mlps):
            x = nn.Dense(c, name=f"mlp_{i}")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_ratio, deterministic=not training)(x)
        return nn.Dense(self.num_classes, name="out")(x)


@MODELS.register_module(name="DistillCls")
class DistillCls(nn.Module):
    """Student classifier with a frozen-teacher distillation hook
    (reference ``cls_base.py:47``): returns (student logits, student global
    feature) so the engine can add a KD term against teacher outputs."""

    encoder_args: Any = None
    cls_args: Any = None
    distill_args: Any = None

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        self.head = (build_model_from_cfg(self.cls_args)
                     if self.cls_args is not None else None)

    def __call__(self, p0, f0=None, training: bool = False):
        if hasattr(p0, "keys"):
            p0, f0 = p0["pos"], p0.get("x")
        g = self.encoder.forward_cls_feat(p0, f0, training=training)
        logits = self.head(g, training=training) if self.head is not None else g
        return logits, g


@MODELS.register_module(name="BaseCls")
class BaseCls(nn.Module):
    """Encoder + cls head (reference ``cls_base.py:13``)."""

    encoder_args: Any = None
    cls_args: Any = None

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        self.head = (build_model_from_cfg(self.cls_args)
                     if self.cls_args is not None else None)

    def __call__(self, p0, f0=None, training: bool = False):
        if hasattr(p0, "keys"):
            p0, f0 = p0["pos"], p0.get("x")
        g = self.encoder.forward_cls_feat(p0, f0, training=training)
        return self.head(g, training=training) if self.head is not None else g
