"""TAP-style cross-view photo generation pretraining stack.

Reference: ``openpoints/models/generation/{view_gen_base,view_transformer,
view_decoder}.py`` — a point-cloud encoder feeds a cross-attention
"photo generator" whose queries are image-plane grid rays, decoded to RGB by a
transposed-conv stack; trained with foreground-weighted MSE against rendered
views.  All flax/channels-last (images NHWC; the reference is NCHW).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..build import MODELS, build_model_from_cfg

xavier = nn.initializers.xavier_uniform()


def rotate_point_clouds_batch(pos: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) x (B, 3, 3) -> rotated (B, N, 3)
    (reference ``openpoints/dataset/data_util.py`` helper)."""
    return jnp.einsum("bnd,bcd->bnc", pos, rot)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """Gated-GELU MLP (reference ``view_transformer.py:78-95``)."""

    mult: float = 4.0
    glu: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        if self.glu:
            h = GEGLU(inner, name="geglu")(x)
        else:
            h = nn.gelu(nn.Dense(inner, name="fc_in")(x), approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(dim, name="fc_out")(h)


class CrossAttention(nn.Module):
    """Multi-head cross attention (reference ``view_transformer.py:33-76``)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, training: bool = False):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        def split(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        B, H, N, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        out = nn.Dense(x.shape[-1], name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not training)(out)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> gated FF with pre-norms
    (reference ``view_transformer.py:98-114``)."""

    n_heads: int
    d_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, training: bool = False):
        x = x + CrossAttention(self.n_heads, self.d_head, self.dropout,
                               name="attn1")(nn.LayerNorm(epsilon=1e-5, name="norm1")(x),
                                             training=training)
        x = x + CrossAttention(self.n_heads, self.d_head, self.dropout,
                               name="attn2")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x),
                                             context=context, training=training)
        x = x + FeedForward(dropout=self.dropout, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x), training=training)
        return x


@MODELS.register_module(name="ViewTransformer")
class ViewTransformer(nn.Module):
    """Cross-attention photo generator (reference ``view_transformer.py:133-238``).

    Point tokens become attention memory; queries are per-pixel rays of the
    target view (back-projected grid centers + view direction + 2-D position).
    """

    in_channels: int = 384
    feat_channels: int = 384
    depth: int = 4
    channels_per_head: int = 64
    drop_rate: float = 0.0
    obj_size: int = 96
    img_size: int = 112
    img_ds_ratio: int = 16
    query_component: Any = None

    def _meshgrid(self):
        fs = self.img_size // self.img_ds_ratio
        hs, ws = np.meshgrid(np.arange(fs), np.arange(fs), indexing="ij")
        mesh = np.stack([hs, ws], axis=-1).reshape(-1, 2).astype(np.float32)
        mesh_center = (mesh + 0.5) * self.img_ds_ratio
        pos = np.stack(np.meshgrid(np.linspace(0, 1, fs), np.linspace(0, 1, fs),
                                   indexing="ij"), axis=-1).reshape(-1, 2)
        return jnp.asarray(mesh_center), jnp.asarray(pos.astype(np.float32))

    def _scale_bias(self, pos_pc, view):
        # reference ``cal_scale_bias`` (``view_transformer.py:186-208``)
        B, V = view.shape[:2]
        N = pos_pc.shape[1]
        flat_view = view.reshape(B * V, 3, 3)
        pos = jnp.broadcast_to(pos_pc[:, None], (B, V, N, 3)).reshape(B * V, N, 3)
        rot = rotate_point_clouds_batch(pos, flat_view)
        pc_min = jnp.min(rot, axis=1)[:, :2]
        pc_range = jnp.max(rot, axis=1) - jnp.min(rot, axis=1)
        grid_size = jnp.max(pc_range[:, :2], axis=-1) / (self.obj_size - 3)
        idx_xy = jnp.floor((rot[:, :, :2] - pc_min[:, None]) / grid_size[:, None, None])
        center = jnp.floor((jnp.max(idx_xy, 1) + jnp.min(idx_xy, 1)) / 2)
        offset = self.obj_size / 2 - center - 1
        pad = (self.img_size - self.obj_size) // 2
        scale = grid_size[:, None]
        bias = pc_min - scale * (offset + pad)
        return scale, bias, flat_view

    @nn.compact
    def __call__(self, feats_pc, pos_feats, pos_pc, view, training: bool = False):
        # feats_pc (B, G, C) tokens; pos_feats (B, G, 3) centers;
        # pos_pc (B, N, 3); view (B, V, 3, 3)
        mesh, qpos = self._meshgrid()
        V = view.shape[1]
        feats = nn.Dense(self.feat_channels * 2, name="feat_mlp_fc1")(
            jnp.concatenate([feats_pc, pos_feats], axis=-1))
        feats = nn.gelu(feats, approximate=False)
        feats = nn.Dense(self.feat_channels, name="feat_mlp_fc2")(feats)
        B, G, C = feats.shape
        memory = jnp.broadcast_to(feats[:, None], (B, V, G, C)).reshape(B * V, G, C)

        scale, bias, flat_view = self._scale_bias(pos_pc, view)
        inv = jnp.linalg.inv(flat_view)
        grid_world = scale[:, None] * mesh[None] + bias[:, None]     # (BV, P, 2)
        point_grid = jnp.einsum("bcd,bnd->bnc", inv[:, :, :2], grid_world)
        P = point_grid.shape[1]
        direction = flat_view[:, :, 2]
        direction = direction / (jnp.linalg.norm(direction, axis=-1,
                                                 keepdims=True) + 1e-12)
        parts = {"point_grid": point_grid,
                 "direction_norm": jnp.broadcast_to(direction[:, None], (B * V, P, 3)),
                 "query_pos": jnp.broadcast_to(qpos[None], (B * V, P, 2))}
        comp = self.query_component or {"point_grid": 3, "direction_norm": 3,
                                        "query_pos": 2}
        query = jnp.concatenate([parts[k] for k in comp], axis=-1)

        q = nn.Dense(self.feat_channels * 2, name="query_mlp_fc1")(query)
        q = nn.gelu(q, approximate=False)
        q = nn.Dense(self.feat_channels, name="query_mlp_fc2")(q)

        for i in range(self.depth):
            q = BasicTransformerBlock(self.channels_per_head,
                                      self.channels_per_head, self.drop_rate,
                                      name=f"block_{i}")(q, context=memory,
                                                         training=training)
        fs = self.img_size // self.img_ds_ratio
        return q.reshape(B * V, fs, fs, self.feat_channels)          # NHWC


@MODELS.register_module(name="ViewDecoder")
class ViewDecoder(nn.Module):
    """Transposed-conv RGB decoder (reference ``view_decoder.py:10-43``)."""

    in_channels: int = 384
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.in_channels
        x = nn.relu(nn.ConvTranspose(c // 2, (5, 5), strides=(4, 4),
                                     name="layer1")(x))
        x = nn.relu(nn.ConvTranspose(c // 4, (3, 3), strides=(2, 2),
                                     name="layer2")(x))
        x = nn.relu(nn.ConvTranspose(c // 8, (3, 3), strides=(2, 2),
                                     name="layer3")(x))
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
                             name="layer4")(x)
        return nn.sigmoid(x)


@MODELS.register_module(name="ViewDecoder_big")
class ViewDecoderBig(nn.Module):
    """Bilinear-upsample + double-conv decoder (reference ``view_decoder.py:76-105``)."""

    in_channels: int = 384
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.in_channels
        for i, cout in enumerate((c // 2, c // 4, c // 8, c // 8)):
            B, H, W, _ = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, x.shape[-1]), "bilinear")
            for j in range(2):
                x = nn.Conv(cout, (3, 3), padding=1, use_bias=False,
                            name=f"layer{i}_conv{j}")(x)
                x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                 epsilon=1e-5, name=f"layer{i}_bn{j}")(x)
                x = nn.relu(x)
        return nn.sigmoid(nn.Conv(self.out_channels, (1, 1), name="out")(x))


@MODELS.register_module(name="ViewDecoder_ds")
class ViewDecoderDS(nn.Module):
    """Deeply-supervised transposed-conv decoder (reference
    ``view_decoder.py:110-166``): four 2x upsampling stages, each tapped by a
    sigmoid conv head; returns the list of four progressively-larger images
    (all NHWC here; the reference is NCHW)."""

    in_channels: int = 384
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.in_channels
        imgs = []
        for i, cout in enumerate((c // 2, c // 4, c // 8, c // 8)):
            x = nn.relu(nn.ConvTranspose(cout, (3, 3), strides=(2, 2),
                                         name=f"layer{i + 1}")(x))
            head = nn.Conv(self.out_channels, (3, 3), padding=1,
                           use_bias=False, name=f"out{i + 1}")(x)
            imgs.append(nn.sigmoid(head))
        return imgs


@MODELS.register_module(name="ViewGenBase")
class ViewGenBase(nn.Module):
    """Encoder + generator + decoder with foreground-weighted MSE
    (reference ``view_gen_base.py:8-52``)."""

    encoder_args: Any = None
    generator_args: Any = None
    decoder_args: Any = None
    loss_args: Any = None

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        self.generator = build_model_from_cfg(self.generator_args)
        self.decoder = build_model_from_cfg(self.decoder_args)

    def __call__(self, p0: Dict[str, jnp.ndarray], f0=None, training: bool = False):
        la = self.loss_args or {}
        w_fg = float(la.get("weight_fg", 1.0))
        w_bg = float(la.get("weight_bg", 1.0))

        feats_pc, coords_pc = self.encoder.forward_cls_feat(p0, f0,
                                                            training=training)
        feats_img = self.generator(feats_pc, coords_pc, p0["pos"],
                                   p0["views"], training=training)
        recon = self.decoder(feats_img, training=training)           # (BV,H,W,3)
        BV, H, W, _ = recon.shape
        img_gt = p0["imgs"].reshape(BV, H, W, 3)
        fg = (jnp.sum((img_gt < 1).astype(jnp.float32), axis=-1,
                      keepdims=True) > 0).astype(jnp.float32)
        se = (recon - img_gt) ** 2
        if "weight" in p0:
            w = p0["weight"].reshape(BV, H, W, 1)
            fg_loss = jnp.sum(se * fg * w) / jnp.maximum(jnp.sum(fg) * 3, 1.0)
        else:
            fg_loss = jnp.sum(se * fg) / jnp.maximum(jnp.sum(fg) * 3, 1.0)
        bg_loss = jnp.sum(se * (1 - fg)) / jnp.maximum(jnp.sum(1 - fg) * 3, 1.0)
        loss = fg_loss * w_fg + bg_loss * w_bg
        return loss, recon
