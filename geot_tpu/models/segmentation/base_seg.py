"""Segmentation wrappers (reference: ``openpoints/models/segmentation/base_seg.py``).

``WholePartSeg`` is the GeoT student/teacher wrapper: in fixmatch mode it
concatenates the labeled, strong-augmented and weak-augmented batches along
the batch axis and runs ONE segmentor forward — on TPU this is exactly what
we want (one big batch through the MXU instead of three small ones).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..build import MODELS, build_model_from_cfg


@MODELS.register_module(name="WholePartSeg")
class WholePartSeg(nn.Module):
    """Reference ``base_seg.py:76-160``.

    __call__ accepts either raw arrays or the reference's dict batches:
    - labeled only:    ``p0={'pos','x','cls'}``
    - fixmatch:        additionally ``u0={'pos_s','x_s','cls_s','pos_w','x_w','cls_w','T'?}``
    - teacher:         ``if_teacher=True`` reads the weak view from ``p0``.

    Returns ``(logit, correction, sigma)`` plus the point features as a 4th
    element (the reference discards them at this level; the engine wants them
    for the contrastive loss).
    """

    segmentor_args: Any = None
    gm_args: Any = None

    def setup(self):
        self.segmentor = build_model_from_cfg(self.segmentor_args)

    def __call__(self, p0, f0=None, cls0=None, u0=None, if_teacher: bool = False,
                 fixmatch: bool = False, training: bool = False):
        T = None
        if if_teacher:
            p0, f0, cls0 = p0["pos_w"], p0["x_w"], p0["cls_w"]
        elif hasattr(p0, "keys"):
            if u0 is not None:
                if fixmatch:
                    p0_, f0_, cls0_ = p0["pos"], p0["x"], p0["cls"]
                    p0 = jnp.concatenate([p0_, u0["pos_s"], u0["pos_w"]], axis=0)
                    f0 = jnp.concatenate([f0_, u0["x_s"], u0["x_w"]], axis=0)
                    cls0 = jnp.concatenate(
                        [cls0_.reshape(-1), u0["cls_s"].reshape(-1),
                         u0["cls_w"].reshape(-1)], axis=0)
                else:
                    cls0 = jnp.concatenate([p0["cls"].reshape(-1),
                                            u0["cls_s"].reshape(-1)], axis=0)
                    f0 = jnp.concatenate([p0["x"], u0["x_s"]], axis=0)
                    p0 = jnp.concatenate([p0["pos"], u0["pos_s"]], axis=0)
                if "T" in u0:
                    T = u0["T"]
            else:
                p0, f0, cls0 = p0["pos"], p0.get("x"), p0["cls"]
        logit, correction, sigma, feats = self.segmentor(
            p0, f0, cls0, T, training=training)
        return logit, correction, sigma, feats


@MODELS.register_module(name="WholePartSeg_ntm")
class WholePartSegNTM(nn.Module):
    """Reference ``base_seg.py:164-240`` — same concat logic, no T thread."""

    segmentor_args: Any = None
    gm_args: Any = None

    def setup(self):
        self.segmentor = build_model_from_cfg(self.segmentor_args)

    def __call__(self, p0, f0=None, cls0=None, u0=None, if_teacher: bool = False,
                 fixmatch: bool = False, training: bool = False):
        if if_teacher:
            p0, f0, cls0 = p0["pos_w"], p0["x_w"], p0["cls_w"]
        elif hasattr(p0, "keys"):
            if u0 is not None and fixmatch:
                p0_, f0_, cls0_ = p0["pos"], p0["x"], p0["cls"]
                p0 = jnp.concatenate([p0_, u0["pos_s"], u0["pos_w"]], axis=0)
                f0 = jnp.concatenate([f0_, u0["x_s"], u0["x_w"]], axis=0)
                cls0 = jnp.concatenate([cls0_.reshape(-1), u0["cls_s"].reshape(-1),
                                        u0["cls_w"].reshape(-1)], axis=0)
            else:
                p0, f0, cls0 = p0["pos"], p0.get("x"), p0["cls"]
        logit, correction, sigma, feats = self.segmentor(
            p0, f0, cls0, None, training=training)
        return logit, correction, sigma, feats


@MODELS.register_module(name="Ins_T")
class InsT(nn.Module):
    """Instance-T predictor wrapper (reference ``base_seg.py:244``)."""

    T_args: Any = None

    def setup(self):
        self.T_predictor = build_model_from_cfg(self.T_args)

    def __call__(self, clean):
        return self.T_predictor(clean)


@MODELS.register_module(name="Ins_T_mean")
class InsTMean(nn.Module):
    """Instance-T predictor with class-mean conditioning
    (reference ``base_seg.py:255``)."""

    T_args: Any = None

    def setup(self):
        self.T_predictor = build_model_from_cfg(self.T_args)

    def __call__(self, clean, cm):
        return self.T_predictor(clean, cm)


@MODELS.register_module(name="BaseSeg")
class BaseSeg(nn.Module):
    """Generic encoder/decoder/head composition (reference ``base_seg.py:16``)."""

    encoder_args: Any = None
    decoder_args: Any = None
    cls_args: Any = None

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        if self.decoder_args is not None:
            dec_args = dict(self.decoder_args)
            dec_args.setdefault("encoder_channel_list", self.encoder.channel_list)
            self.decoder = build_model_from_cfg(dec_args)
        else:
            self.decoder = None
        self.head = (build_model_from_cfg(self.cls_args)
                     if self.cls_args is not None else None)

    def __call__(self, p0, f0=None, training: bool = False):
        if hasattr(p0, "keys"):
            p0, f0 = p0["pos"], p0.get("x")
        l_xyz, l_feats = self.encoder.forward_seg_feat(p0, f0, training=training)
        if self.decoder is not None:
            f = self.decoder(l_xyz, l_feats, training=training)
        else:
            # encoders returning a single (B, N, C) feature map (e.g. DGCNN)
            # vs the per-level list of the U-Net style encoders
            f = l_feats[-1] if isinstance(l_feats, (list, tuple)) else l_feats
        if self.head is not None:
            f = self.head(f, training=training)
        return f


@MODELS.register_module(name="BasePartSeg")
class BasePartSeg(nn.Module):
    """Part segmentation composition (reference ``base_seg.py:55-72``): like
    BaseSeg but the decoder is conditioned on the shape-category label and the
    batch may arrive as raw arrays ``(p0, f0, cls0)`` or a dict."""

    encoder_args: Any = None
    decoder_args: Any = None
    cls_args: Any = None

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        if self.decoder_args is not None:
            dec_args = dict(self.decoder_args)
            dec_args.setdefault("encoder_channel_list", self.encoder.channel_list)
            self.decoder = build_model_from_cfg(dec_args)
        else:
            self.decoder = None
        self.head = (build_model_from_cfg(self.cls_args)
                     if self.cls_args is not None else None)

    def __call__(self, p0, f0=None, cls0=None, training: bool = False):
        if hasattr(p0, "keys"):
            p0, f0, cls0 = p0["pos"], p0.get("x"), p0.get("cls")
        l_xyz, l_feats = self.encoder.forward_seg_feat(p0, f0, training=training)
        if self.decoder is not None:
            f = self.decoder(l_xyz, l_feats, cls0, training=training)
        else:
            f = l_feats[-1] if isinstance(l_feats, (list, tuple)) else l_feats
        if self.head is not None:
            f = self.head(f, training=training)
        return f


@MODELS.register_module(name="DistillBaseSeg")
class DistillBaseSeg(nn.Module):
    """Distillation seg wrapper.  The reference class is entirely commented
    out (``base_seg.py:433-470`` — dead code identical to BaseSeg plus unused
    ``distill_args``/``criterion_args``); registered here functionally for
    registry parity with the same accepted-and-ignored extra args."""

    encoder_args: Any = None
    decoder_args: Any = None
    cls_args: Any = None
    distill_args: Any = None
    criterion_args: Any = None

    def setup(self):
        self.inner = BaseSeg(self.encoder_args, self.decoder_args,
                             self.cls_args)

    def __call__(self, data, training: bool = False):
        return self.inner(data, training=training)


@MODELS.register_module(name="SegHead")
class GenericSegHead(nn.Module):
    """Per-point classification head (reference ``base_seg.py:284-342``):
    pointwise MLP + dropout + final Dense to num_classes, with optional
    global max/avg feature concat (``global_feat`` comma-list)."""

    num_classes: int = 17
    in_channels: Optional[int] = None
    mlps: Optional[Sequence[int]] = None
    dropout_ratio: float = 0.5
    global_feat: Optional[str] = None

    @nn.compact
    def __call__(self, f, training: bool = False):
        if self.global_feat:
            gfs = []
            for feat_type in self.global_feat.split(","):
                if "max" in feat_type:
                    gfs.append(jnp.max(f, axis=1, keepdims=True))
                elif feat_type in ("avg", "mean"):
                    gfs.append(jnp.mean(f, axis=1, keepdims=True))
            g = jnp.concatenate(gfs, axis=-1)
            f = jnp.concatenate([f, jnp.broadcast_to(
                g, f.shape[:2] + (g.shape[-1],))], axis=-1)
        mlps = list(self.mlps) if self.mlps is not None else [f.shape[-1]]
        for i, c in enumerate(mlps):
            f = nn.Dense(c, name=f"mlp_{i}")(f)
            f = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}")(f)
            f = nn.relu(f)
        if self.dropout_ratio > 0:
            f = nn.Dropout(self.dropout_ratio, deterministic=not training)(f)
        return nn.Dense(self.num_classes, name="out")(f)


@MODELS.register_module(name="VariableSegHead")
class VariableSegHead(nn.Module):
    """Linear-block head used with offset-batched (variable-length) scenes
    (reference ``base_seg.py:345-380``) — identical math to SegHead in the
    dense layout."""

    num_classes: int = 17
    in_channels: Optional[int] = None
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, f, training: bool = False):
        c = self.in_channels or f.shape[-1]
        f = nn.Dense(c, name="fc0")(f)
        f = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="bn0")(f)
        f = nn.relu(f)
        if self.dropout_ratio > 0:
            f = nn.Dropout(self.dropout_ratio, deterministic=not training)(f)
        return nn.Dense(self.num_classes, name="out")(f)


@MODELS.register_module(name="MultiSegHead")
class MultiSegHead(nn.Module):
    """Per-shape-category part heads (reference ``base_seg.py:382-426``):
    one small head per category, returns stacked logits padded to the max
    part count (consumed by ``MultiShapeCrossEntropy``)."""

    num_classes: int = 50
    in_channels: Optional[int] = None
    shape_classes: int = 16
    num_parts: Sequence[int] = (4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3)
    dropout_ratio: float = 0.0

    @nn.compact
    def __call__(self, f, training: bool = False):
        max_parts = max(self.num_parts)
        outs = []
        for i in range(self.shape_classes):
            h = nn.Dense(f.shape[-1], name=f"head{i}_fc")(f)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f"head{i}_bn")(h)
            h = nn.relu(h)
            if self.dropout_ratio > 0:
                h = nn.Dropout(self.dropout_ratio, deterministic=not training)(h)
            h = nn.Dense(self.num_parts[i], name=f"head{i}_out")(h)
            pad = max_parts - self.num_parts[i]
            if pad:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, pad)),
                            constant_values=-1e9)
            outs.append(h)
        return jnp.stack(outs)        # (S, B, N, max_parts)


@MODELS.register_module(name="VariableSeg")
class VariableSeg(nn.Module):
    """Encoder/decoder/head composition for variable-length scenes
    (reference ``base_seg.py:267-281``) — dense fixed-shape equivalent."""

    encoder_args: Any = None
    decoder_args: Any = None
    cls_args: Any = None

    def setup(self):
        self.inner = BaseSeg(self.encoder_args, self.decoder_args, self.cls_args)

    def __call__(self, data, training: bool = False):
        return self.inner(data, training=training)
