"""Point Transformer backbone family — the GeoT flagship.

Reference: ``openpoints/models/backbone/transformer.py`` (1289 LoC, torch +
pointnet2/pointops/knn_cuda CUDA extensions).  This rebuild is flax.linen over
``geot_tpu.ops``; channels-last throughout; all neighbour searches are the
blockwise TPU kNN/FPS kernels.

Architecture (seg variants, reference ``transformer.py:914-1068``):
16k pts --FPS-> 512 centers --kNN32-> neighbourhoods --mini-PointNet-> tokens
 -> 12 ViT blocks (dim 384, 4 heads, pos re-added every block, taps at 4/8/12)
 -> FPS pyramid [8192, 4096, 2048] + three_nn feature propagation + 2x DGCNN
    graph upsampling -> per-point seg head -> (B, N, nclasses) logits.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.linen.dtypes import promote_dtype

from ...ops import (fps, fps_stratified, gather_points, grouping_operation,
                    knn, three_interpolation)
from ..build import MODELS
from ..layers.common import DropPath, MlpBlock, SharedMLP, drop_path_rates
from ..layers.group_embed import GroupTokenizer

xavier = nn.initializers.xavier_uniform()


class _FactoredConcatDense(nn.Module):
    """``Dense(concat([broadcast(g), x]))`` with ``g`` constant along the
    neighbour axis, factored as ``x @ W_x + (g @ W_g + bias)`` so the big
    matmul runs per-point instead of per-(point, neighbour).  Exact algebra;
    owns the same ``kernel``/``bias`` params as the fused ``nn.Dense`` it
    replaces (checkpoint-compatible)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray):
        # g: (B, G, 1, C) shared term, x: (B, G, K, C)
        C = x.shape[-1]
        kernel = self.param("kernel", xavier, (2 * C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        g, x, kernel, bias = promote_dtype(g, x, kernel, bias, dtype=self.dtype)
        return x @ kernel[C:] + (g @ kernel[:C] + bias)


class MiniPointNetEncoder(nn.Module):
    """Per-group PointNet: 3 -> 256 local, max-pool global concat, -> enc_dim
    (reference ``Encoder``, ``transformer.py:106-136``)."""

    encoder_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, point_groups: jnp.ndarray, training: bool = False):
        # point_groups: (B, G, K, 3)
        x = nn.Dense(128, kernel_init=xavier, dtype=self.dtype, name="conv1a")(point_groups)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(256, kernel_init=xavier, dtype=self.dtype, name="conv1b")(x)
        g = jnp.max(x, axis=2, keepdims=True)                         # (B,G,1,256)
        # concat([broadcast(g), x]) @ W factored so the global term is
        # computed once per group, not once per neighbour (exact algebra)
        x = _FactoredConcatDense(512, dtype=self.dtype, name="conv2a")(g, x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, kernel_init=xavier, dtype=self.dtype,
                     name="conv2b")(x)
        return jnp.max(x, axis=2)                                     # (B,G,C)


class Attention(nn.Module):
    """Multi-head self-attention over group tokens
    (reference ``transformer.py:36-61``). 512 tokens -> plain dense attention;
    XLA maps the (B, H, G, G) einsums straight onto the MXU."""

    num_heads: int
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, kernel_init=xavier,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                               # (B,H,N,hd)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not training)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, kernel_init=xavier, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not training)(out)
        return out


class Block(nn.Module):
    """Pre-norm ViT block with stochastic depth (reference ``transformer.py:64-82``)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = Attention(self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
                      dtype=self.dtype, name="attn")(h, training=training)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, training=training)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        # kernel_init=xavier: the reference xavier-uniforms EVERY Linear/Conv
        # recursively via ``_init_weights`` (``transformer.py:997-1012``),
        # including the MLP fc1/fc2 — from-scratch init parity
        h = MlpBlock(int(C * self.mlp_ratio), C, self.drop, dtype=self.dtype,
                     kernel_init=xavier, name="mlp")(h, training=training)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, training=training)
        return x


class TransformerStack(nn.Module):
    """Block stack; ``extract_layers`` taps intermediate activations — the
    position embedding is re-added before EVERY block, matching
    ``TransformerEncoder_h.forward`` (reference ``transformer.py:399-410``)."""

    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    extract_layers: Optional[Sequence[int]] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, training: bool = False):
        dpr = drop_path_rates(self.drop_path_rate, self.depth)
        taps = []
        for i in range(self.depth):
            x = Block(self.num_heads, drop=self.drop_rate,
                      attn_drop=self.attn_drop_rate, drop_path=dpr[i],
                      dtype=self.dtype, name=f"block_{i}")(x + pos, training=training)
            if self.extract_layers is not None and (i + 1) in self.extract_layers:
                taps.append(x)
        return taps if self.extract_layers is not None else x


class PosEmbed(nn.Module):
    """3 -> 128 -> dim MLP positional embedding (reference ``transformer.py:945``)."""

    dim: int

    @nn.compact
    def __call__(self, center):
        x = nn.Dense(128, kernel_init=xavier, name="fc1")(center)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, kernel_init=xavier, name="fc2")(x)


class FeaturePropagation(nn.Module):
    """three_nn + inverse-distance interpolation + skip concat + SharedMLP —
    ``PointnetFPModule`` (reference ``pointnet2/pointnet2_modules.py:582-642``)."""

    mlp: Sequence[int]               # output channels (input inferred)
    dtype: Any = None

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 training: bool = False, prefix_n: int | None = None):
        if prefix_n is not None:
            # serving fast path: the first prefix_n unknown rows ARE the
            # known set (pyramid levels are prefixes of one shared order),
            # so their 3-NN interpolation is the identity (d1=0 drives the
            # inverse-distance weights to ~[1,0,0]); only the remaining
            # rows pay the kNN
            rest = three_interpolation(unknown_xyz[:, prefix_n:], known_xyz,
                                       known_feats)
            interp = jnp.concatenate([known_feats.astype(rest.dtype), rest],
                                     axis=1)
        else:
            interp = three_interpolation(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp,
                                      unknown_feats.astype(interp.dtype)], axis=-1)
        # xavier like every other Dense in this backbone (reference
        # ``_init_weights`` covers the FP SharedMLP convs too)
        return SharedMLP(self.mlp, dtype=self.dtype, kernel_init=xavier,
                         name="mlp")(interp, training=training)


class DGCNNPropagation(nn.Module):
    """Graph-conv upsampling (reference ``DGCNN_Propagation``,
    ``transformer.py:305-379``): two edge-conv layers with GroupNorm(4) +
    LeakyReLU(0.2) and max-over-neighbours, k=4.

    The reference hard-codes hidden/output dims 512/384 for trans_dim 384;
    here they scale as (4D/3, D), which reproduces those numbers exactly.

    Perf note (measured, round 3): the concat-then-Dense edge conv is the
    OPTIMAL structure on this hardware — the (Nq*k, 2C)@(2C, F) dots run at
    ~190 TFLOP/s (MXU peak) with the neighbour gather fused into the operand.
    Two factored rewrites (gather(x_k@W_diff) + x_q@(W_cent-W_diff), and a
    further GroupNorm-stats decomposition with the monotone max-trick) cut
    FLOPs 5x but replaced peak-MXU work with ~220 GB/s gather/elementwise
    fusions: 5.19 -> 5.74 / 6.14 ms serving device time.  Don't redo.
    """

    k: int = 4
    dim: int = 384
    dtype: Any = None

    def _graph_feature(self, coor_q, x_q, coor_k, x_k, idx=None):
        if idx is None:
            _, idx = knn(coor_q, coor_k, self.k)                    # (B, Nq, k)
        neigh = grouping_operation(x_k, idx)                        # (B, Nq, k, C)
        center = jnp.broadcast_to(x_q[:, :, None, :], neigh.shape)
        return jnp.concatenate([neigh - center, center], axis=-1), idx

    @nn.compact
    def __call__(self, coor, f, coor_q, f_q, training: bool = False,
                 reuse_cross_idx: bool = False):
        # coor/f: coarse level; coor_q/f_q: fine level (channels-last)
        #
        # reuse_cross_idx (serving fast path): the second edge conv reuses the
        # first's cross-level neighbour indices instead of running a fine-level
        # self-kNN.  Only valid when the coarse rows are a PREFIX of the fine
        # rows (the stratified serving order), so the indices address the same
        # physical points in both arrays; each fine point's layer-2 neighbours
        # are then its 4 nearest COARSE points (a uniformly-spread subset) —
        # quality evidence in log/fast_pyramid_eval.json.
        hidden = 4 * self.dim // 3
        h, cross_idx = self._graph_feature(coor_q, f_q, coor, f)
        h = nn.Dense(hidden, use_bias=False, kernel_init=xavier, dtype=self.dtype, name="layer1_conv")(h)
        h = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype,
                         name="layer1_gn")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = jnp.max(h, axis=2)
        h2, _ = self._graph_feature(coor_q, h, coor_q, h,
                                    idx=cross_idx if reuse_cross_idx else None)
        h2 = nn.Dense(self.dim, use_bias=False, kernel_init=xavier, dtype=self.dtype, name="layer2_conv")(h2)
        h2 = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype,
                          name="layer2_gn")(h2)
        h2 = nn.leaky_relu(h2, negative_slope=0.2)
        return jnp.max(h2, axis=2)


class SegHead(nn.Module):
    """Conv1d(384->128) + BN + Dropout(0.5) + Conv1d(128->C)
    (reference ``transformer.py:970-975``).  ``dropout`` is configurable
    (reference-parity default 0.5) — e.g. 0 for deterministic trajectory
    tests; dropout masks are batch-position-dependent, so any nonzero rate
    makes the train step depend on row order."""

    nclasses: int
    dtype: Any = None
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, training: bool = False, return_proto: bool = False):
        x = nn.Dense(128, kernel_init=xavier, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        dense = nn.Dense(self.nclasses, kernel_init=xavier, name="conv2")
        out = dense(x)
        if return_proto:
            # recover the kernel without reaching into module internals:
            # dense(I) - dense(0) == kernel (128, C)
            eye = jnp.eye(x.shape[-1], dtype=x.dtype)
            proto = dense(eye) - dense(jnp.zeros((1, x.shape[-1]), x.dtype))
            return out, proto
        return out


class _PointTransformerSegBase(nn.Module):
    """Shared forward of the seg variants (reference ``transformer.py:506-1068``).

    Subclasses toggle the NTM head (``with_T``).  Returns
    ``(logit (B,N,C), correction, sigma, f_l0 (B,N,384))``.
    """

    trans_dim: int = 384
    depth: int = 12
    drop_path_rate: float = 0.1
    nclasses: int = 17
    num_heads: int = 4
    group_size: int = 32
    num_group: int = 512
    encoder_dims: int = 256
    downsample_targets: Sequence[int] = (8192, 4096, 2048)
    extract_layers: Sequence[int] = (4, 8, 12)
    with_T: bool = False
    head_mode: str = "plain"     # plain | cluster | classifier
    head_dropout: float = 0.5    # seg-head dropout (reference 0.5)
    dtype: Any = None            # computation dtype (e.g. bf16); params stay f32
    # serving mode: stratified decoder pyramid. False = full FPS run;
    # True = FPS for the num_group tokenizer centers only; int L = FPS for
    # the first L selections (tokenizer + coarse levels), permutation-fill
    # the rest (quality-neutral at L=2048, see log/fast_pyramid_eval.json)
    fast_pyramid: bool | int = False
    # serving mode: the DGCNN layers' second edge conv reuses the first's
    # cross-level neighbour indices (drops both fine-level self-kNNs, ~0.9 ms
    # at 16k).  Requires the stratified prefix order, so only honoured when
    # fast_pyramid is on.
    fast_graph: bool = False

    @nn.compact
    def __call__(self, pts, x=None, cls_label=None, T=None,
                 training: bool = False):
        B, N, _ = pts.shape
        D = self.trans_dim

        # FPS prefix sharing: greedy FPS selections are incremental, so the
        # tokenizer centers (num_group) and the whole decoder pyramid
        # (downsample_targets) are prefixes of ONE max-length FPS run — the
        # reference's four separate CUDA FPS launches (``transformer.py:1017,
        # 1037-1040``) collapse into a single kernel call with identical
        # results (same start-at-0 convention).
        #
        # fast_pyramid (serving): the sequential FPS chain only runs for the
        # first L selections (L = num_group when True, or the given int —
        # e.g. 2048 covers the tokenizer AND the coarsest decoder levels with
        # TRUE farthest-point samples); the remaining pyramid rows are filled
        # from a FIXED pseudo-random permutation of the NOT-YET-SELECTED
        # points (exact complement, so levels stay sample-without-replacement
        # like a real FPS run).  At half density and below greedy FPS
        # approximates uniform coverage, which is what the permutation fill
        # provides — quality evidence in log/fast_pyramid_eval.json.
        if self.fast_pyramid:
            L = self.num_group if self.fast_pyramid is True \
                else max(int(self.fast_pyramid), self.num_group)
            max_n = max(max(self.downsample_targets), L)
            # full permutation [true-FPS prefix | stratified fill | rest]:
            # the WHOLE cloud is processed in this order so every decoder
            # support set is a PREFIX of its query array — support rows skip
            # the 3-NN search entirely (FeaturePropagation prefix_n); the
            # output is un-permuted once at the end
            perm_full = fps_stratified(pts, N, L)                 # (B, N)
            pts = gather_points(pts, perm_full)
            fps_pts = pts[:, :max_n]
        else:
            max_n = max(max(self.downsample_targets), self.num_group)
            perm_full = None
            fps_idx = fps(pts, max_n)
            fps_pts = gather_points(pts, fps_idx)

        center = fps_pts[:, : self.num_group]
        _, knn_idx = knn(center, pts, self.group_size)
        neighborhood = grouping_operation(pts, knn_idx) - center[:, :, None, :]
        tokens = MiniPointNetEncoder(self.encoder_dims, dtype=self.dtype,
                                     name="encoder")(neighborhood, training=training)
        if self.encoder_dims != D:
            tokens = nn.Dense(D, kernel_init=xavier, name="reduce_dim")(tokens)
        pos = PosEmbed(D, name="pos_embed")(center)
        taps = TransformerStack(D, self.depth, self.num_heads,
                                self.drop_path_rate,
                                extract_layers=tuple(self.extract_layers),
                                dtype=self.dtype,
                                name="blocks")(tokens, pos, training=training)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        taps = [norm(t) for t in taps]

        # jaw one-hot (mandible/maxillary) broadcast to every point
        if cls_label is None:
            cls_label = jnp.zeros((B,), dtype=jnp.int32)
        cls_label = cls_label.reshape(B)
        cls_onehot = jax.nn.one_hot(cls_label, 2, dtype=pts.dtype)   # (B,2)
        cls_onehot = jnp.broadcast_to(cls_onehot[:, None, :], (B, N, 2))
        f_l0_in = jnp.concatenate([cls_onehot, pts], axis=-1)        # (B,N,5)

        # FPS pyramid = prefixes of the shared run (see above)
        center_pts = [fps_pts[:, :t] for t in self.downsample_targets]

        prefix = self.num_group if perm_full is not None else None
        f_l3 = taps[2]                                               # (B,512,D)
        f_l2 = FeaturePropagation([D * 4, D], dtype=self.dtype, name="propagation_2")(
            center_pts[1], center, center_pts[1], taps[1], training=training,
            prefix_n=prefix)
        f_l1 = FeaturePropagation([D * 4, D], dtype=self.dtype, name="propagation_1")(
            center_pts[0], center, center_pts[0], taps[0], training=training,
            prefix_n=prefix)

        reuse = bool(self.fast_graph) and perm_full is not None
        f_l2 = DGCNNPropagation(k=4, dim=D, dtype=self.dtype, name="dgcnn_pro_2")(
            center, f_l3, center_pts[1], f_l2, training=training,
            reuse_cross_idx=reuse)
        f_l1 = DGCNNPropagation(k=4, dim=D, dtype=self.dtype, name="dgcnn_pro_1")(
            center_pts[1], f_l2, center_pts[0], f_l1, training=training,
            reuse_cross_idx=reuse)

        f_l0 = FeaturePropagation([D * 4, D], dtype=self.dtype, name="propagation_0")(
            pts, center_pts[0], f_l0_in, f_l1, training=training,
            prefix_n=self.downsample_targets[0] if perm_full is not None
            else None)

        seg_head = SegHead(self.nclasses, dtype=self.dtype,
                           dropout=self.head_dropout, name="seg_head")
        if self.head_mode == "classifier":
            logit, proto = seg_head(f_l0, training=training, return_proto=True)
            # class-prototype features from the (detached, L2-normalised)
            # final classifier weights x log-softmax
            # (reference ``PointTransformer_seg_classifier``, ``transformer.py:898-905``)
            proto = jax.lax.stop_gradient(proto)              # (128, C)
            proto = proto / (jnp.linalg.norm(proto, axis=0, keepdims=True) + 1e-12)
            logp = jax.nn.log_softmax(logit, axis=-1)          # (B, N, C)
            feats_out = jnp.matmul(logp, proto.T)              # (B, N, 128)
        else:
            logit = seg_head(f_l0, training=training)
            feats_out = f_l0
        logit = logit.astype(jnp.float32)

        if self.head_mode == "cluster":
            # 64-d contrast projection head
            # (reference ``PointTransformer_seg_cluster``, ``transformer.py:697-706``)
            # Computed BEFORE the fast_pyramid un-permute so the contrast
            # features go through the same inverse gather as the logits.
            h = f_l0
            for i, c in enumerate((128, 128, 64)):
                h = nn.Dense(c, kernel_init=xavier, name=f"proj_{i}")(h)
                h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                 epsilon=1e-5, name=f"proj_bn_{i}")(h)
                if i < 2:
                    h = nn.relu(h)
            feats_out = h

        if perm_full is not None:
            # un-permute back to the caller's point order; perm_full is a
            # permutation, so its inverse is a scatter of iota (cheaper than
            # the argsort's O(log^2 N) sorting network)
            inv = jnp.zeros((B, N), jnp.int32).at[
                jnp.arange(B)[:, None], perm_full].set(
                jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N)),
                unique_indices=True)
            logit = jnp.take_along_axis(logit, inv[..., None], axis=1)
            feats_out = jnp.take_along_axis(feats_out, inv[..., None], axis=1)

        correction = None
        sigma = None
        if self.with_T:
            # T_linear: zero-init C x C, applied to the class-level NTM;
            # T_revision exists in the reference checkpoint but is unused in
            # forward (``transformer.py:979-983``) — kept for ckpt parity.
            self.param("T_revision", nn.initializers.zeros,
                       (self.nclasses, self.nclasses))
            t_linear = self.param("T_linear", nn.initializers.zeros,
                                  (self.nclasses, self.nclasses))
            sigma = self.param("sigma",
                               nn.initializers.constant(0.4), (self.nclasses,))
            if T is not None:
                correction = T @ t_linear.T
        return logit, correction, sigma, feats_out


def _seg_kwargs(kwargs):
    """Drop cfg keys the flax dataclass doesn't take (pretrained_path is
    handled by the engine's checkpoint loader, not the module); map string
    dtypes from YAML (e.g. ``dtype: bfloat16``) to jnp dtypes."""
    fields = _PointTransformerSegBase.__dataclass_fields__
    out = {k: v for k, v in kwargs.items() if k in fields and k != "with_T"}
    if isinstance(out.get("dtype"), str):
        out["dtype"] = jnp.dtype(out["dtype"])
    return out


@MODELS.register_module(name="PointTransformer_seg_T")
def PointTransformerSegT(**kwargs):
    """The GeoT flagship: seg backbone + NTM revision head
    (reference ``transformer.py:914``)."""
    return _PointTransformerSegBase(with_T=True, **_seg_kwargs(kwargs))


@MODELS.register_module(name="PointTransformer_seg")
def PointTransformerSeg(**kwargs):
    """Plain seg variant without the NTM head (reference ``transformer.py:506``)."""
    return _PointTransformerSegBase(with_T=False, **_seg_kwargs(kwargs))


@MODELS.register_module(name="PointTransformer_seg_2classifier")
def PointTransformerSeg2Classifier(**kwargs):
    """Reference ``transformer.py:1134`` — identical forward to the plain seg
    variant (its second classifier was never wired up in the reference)."""
    return _PointTransformerSegBase(with_T=False, **_seg_kwargs(kwargs))


@MODELS.register_module(name="PointTransformer_seg_cluster")
def PointTransformerSegCluster(**kwargs):
    """Seg + 64-d contrast projection head (reference ``transformer.py:634``)."""
    return _PointTransformerSegBase(with_T=False, head_mode="cluster",
                                    **_seg_kwargs(kwargs))


@MODELS.register_module(name="PointTransformer_seg_classifier")
def PointTransformerSegClassifier(**kwargs):
    """Seg + prototype features from the head weights
    (reference ``transformer.py:776``)."""
    return _PointTransformerSegBase(with_T=False, head_mode="classifier",
                                    **_seg_kwargs(kwargs))


@MODELS.register_module(name="PointTransformer_genencoder")
class PointTransformerGenEncoderSeg(nn.Module):
    """Group-token encoder used by the TAP generation stack
    (reference ``transformer.py:413-504``): tokenize, run the tapped block
    stack, return (last tap tokens (B, G, D), centers (B, G, 3))."""

    trans_dim: int = 384
    depth: int = 12
    drop_path_rate: float = 0.1
    num_heads: int = 4
    group_size: int = 32
    num_group: int = 512
    encoder_dims: int = 256
    extract_layers: Sequence[int] = (4, 8, 12)
    nclasses: int = 17
    downsample_targets: Sequence[int] = (8192, 4096, 2048)

    @nn.compact
    def __call__(self, p, f0=None, training: bool = False):
        pts = p["pos"] if hasattr(p, "keys") else p
        tokenizer = GroupTokenizer(self.num_group, self.group_size)
        neighborhood, center, _ = tokenizer(pts)
        tokens = MiniPointNetEncoder(self.encoder_dims,
                                     name="encoder")(neighborhood, training=training)
        if self.encoder_dims != self.trans_dim:
            tokens = nn.Dense(self.trans_dim, kernel_init=xavier,
                              name="reduce_dim")(tokens)
        pos = PosEmbed(self.trans_dim, name="pos_embed")(center)
        taps = TransformerStack(self.trans_dim, self.depth, self.num_heads,
                                self.drop_path_rate,
                                extract_layers=tuple(self.extract_layers),
                                name="blocks")(tokens, pos, training=training)
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(taps[-1])
        return out, center

    def forward_cls_feat(self, p, f0=None, training: bool = False):
        return self(p, f0, training=training)


class _ClsTokenEncoder(nn.Module):
    """Shared body of the cls-token encoders
    (reference ``PointTransformerGenEncoder``/``PointTransformerEncoder``,
    ``transformer.py:140-264``): SubsampleGroup tokenizer + cls token/pos +
    untapped block stack."""

    num_groups: int = 256
    group_size: int = 32
    subsample: str = "fps"
    group: str = "ballquery"
    radius: float = 0.1
    encoder_dims: int = 256
    trans_dim: int = 384
    drop_path_rate: float = 0.1
    depth: int = 12
    num_heads: int = 6
    in_channels: int = 3

    def encode(self, pts, training: bool = False):
        from ..layers.group_embed import SubsampleGroup

        grouper = SubsampleGroup(self.num_groups, self.group_size,
                                 self.subsample, self.group, self.radius)
        neighborhood, center = grouper(pts)
        tokens = MiniPointNetEncoder(self.encoder_dims,
                                     name="encoder")(neighborhood, training=training)
        tokens = nn.Dense(self.trans_dim, kernel_init=xavier,
                          name="reduce_dim")(tokens)
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.trans_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                             (1, 1, self.trans_dim))
        B = tokens.shape[0]
        pos = PosEmbed(self.trans_dim, name="pos_embed")(center)
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.trans_dim)),
                             tokens], axis=1)
        pos = jnp.concatenate([jnp.broadcast_to(cls_pos, (B, 1, self.trans_dim)),
                               pos], axis=1)
        x = TransformerStack(self.trans_dim, self.depth, self.num_heads,
                             self.drop_path_rate, extract_layers=None,
                             name="blocks")(x, pos, training=training)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x, center


@MODELS.register_module(name="PointTransformerGenEncoder")
class PointTransformerGenEncoder(_ClsTokenEncoder):
    """Reference ``transformer.py:140-199``: returns (tokens sans cls, centers)."""

    @nn.compact
    def __call__(self, pts, x=None, training: bool = False):
        if hasattr(pts, "keys"):
            pts = pts["pos"]
        out, center = self.encode(pts, training=training)
        return out[:, 1:, :], center

    forward_cls_feat = __call__


@MODELS.register_module(name="PointTransformerEncoder")
class PointTransformerEncoder(_ClsTokenEncoder):
    """Reference ``transformer.py:203-264``: returns [cls ; max-pool tokens]."""

    @nn.compact
    def __call__(self, pts, f0=None, training: bool = False):
        if hasattr(pts, "keys"):
            pts = pts["pos"]
        out, _ = self.encode(pts, training=training)
        return jnp.concatenate([out[:, 0], jnp.max(out[:, 1:], axis=1)], axis=-1)

    forward_cls_feat = __call__


@MODELS.register_module(name="sig_t")
class SigT(nn.Module):
    """Global learnable transition matrix from softmax outputs
    (reference ``transformer.py:1072-1097``): Linear(C -> C*C), clamp,
    row-L1-normalise."""

    nclasses: int

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C) softmax outputs (reference takes (B, C, N))
        C = self.nclasses
        out = x.reshape(-1, C)
        init = nn.initializers.constant(0.1 / C)
        w = self.param("fc", init, (C * C, C))       # rows like reference fc.weight
        out = out @ w.T                               # (BN, C*C)
        out = out.reshape(-1, C, C)
        out = jnp.clip(out, 1e-5, 1 - 1e-5)
        return out / jnp.sum(out, axis=2, keepdims=True)


@MODELS.register_module(name="sig_t_mean")
class SigTMean(nn.Module):
    """Instance-dependent transition matrix predictor
    (reference ``transformer.py:1100-1131``): per-class Linear(2C -> C) over
    [softmax(x); cm[k]] ensembles.  Vectorised over classes as two einsums:
    the per-class weight W_k = [W1_k; W2_k] splits into a data path
    (x @ W1_k) and a constant path (cm_k @ W2_k)."""

    nclasses: int

    @nn.compact
    def __call__(self, x, cm):
        # x: (B, N, C) softmax; cm: (C, C) class-mean softmax matrix
        C = self.nclasses
        out = x.reshape(-1, C)                                         # (M, C)
        # per-class stack of Linear(2C -> C) weights: batch_axis=0 keeps the
        # xavier fan PER CLASS (fan_in 2C, fan_out C) — plain xavier over the
        # 3-D param would fold the class dim into the receptive field and
        # shrink the init ~sqrt(C)
        per_class_xavier = nn.initializers.variance_scaling(
            1.0, "fan_avg", "uniform", in_axis=-2, out_axis=-1, batch_axis=0)
        w = self.param("fc", per_class_xavier, (C, 2 * C, C))
        w1, w2 = w[:, :C, :], w[:, C:, :]
        data = jnp.einsum("mc,kcd->mkd", out, w1)                      # (M, C, C)
        const = jnp.einsum("kc,kcd->kd", cm, w2)                       # (C, C)
        ins_t = data + const[None]
        ins_t = jnp.clip(ins_t, 1e-5, 1 - 1e-5)
        return ins_t / jnp.sum(ins_t, axis=2, keepdims=True)


@MODELS.register_module(name="Gragh_Matching")
class GraghMatching(nn.Module):
    """Registry-parity stub: the reference class
    (``transformer.py:1263-1289``) is non-functional — its ``forward`` is
    ``pass`` and ``node_sampling`` is unfinished — so this mirrors the surface
    and raises if actually invoked."""

    in_channels: int = 128
    nclasses: int = 17
    sample_nums: int = 1024

    def __call__(self, feat_s, feat_t, label_t):
        raise NotImplementedError(
            "Gragh_Matching is an unfinished stub in the reference "
            "(forward is `pass`); kept only for registry parity.")
