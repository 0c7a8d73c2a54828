"""Numerical parity vs a torch oracle (SURVEY.md §4 item 2 / BASELINE north
star: logits match to fp32 tolerance).

The oracle below is a fresh CPU-torch implementation of the
``PointTransformer_seg_T`` forward, with module names matching the reference
state_dict layout (so it exercises ``convert_torch_seg_t`` exactly as a real
reference checkpoint would).  Neighbour search uses cdist/topk and a greedy
numpy FPS — identical semantics to ``geot_tpu.ops`` on continuous random data.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geot_tpu.engine.checkpoint import convert_torch_seg_t  # noqa: E402
from geot_tpu.models import build_model_from_cfg  # noqa: E402

# --- small config shared by both sides -------------------------------------
D = 48          # trans_dim
DEPTH = 3
HEADS = 4
GROUPS = 32
GSIZE = 8
ENC = 32        # encoder_dims
NCLS = 17
N = 256
TARGETS = [128, 64, 32]
EXTRACT = [1, 2, 3]
B = 2


def np_fps(xyz, npoint):
    Nn = xyz.shape[0]
    idx = np.zeros(npoint, dtype=np.int64)
    mind = np.full(Nn, 1e10)
    last = 0
    for j in range(1, npoint):
        d2 = ((xyz - xyz[last]) ** 2).sum(-1)
        mind = np.minimum(mind, d2)
        last = int(np.argmax(mind))
        idx[j] = last
    return idx


def t_knn(query, support, k):
    """(B, M, 3), (B, N, 3) -> idx (B, M, k), euclidean ascending."""
    d = torch.cdist(query, support)
    return d.topk(k, dim=-1, largest=False).indices


def t_three_interp(unknown, known, feats):
    """feats (B, m, C) -> (B, n, C) IDW 3-NN, matching the reference recipe
    (``pointnet2/pointnet2_modules.py:601-627``)."""
    d = torch.cdist(unknown, known)
    vals, idx = d.topk(3, dim=-1, largest=False)
    recip = 1.0 / (vals + 1e-8)
    w = recip / recip.sum(-1, keepdim=True)
    gathered = torch.stack([f[i] for f, i in zip(feats, idx)])  # (B, n, 3, C)
    return (gathered * w.unsqueeze(-1)).sum(2)


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        Bb, Nn, C = x.shape
        qkv = self.qkv(x).reshape(Bb, Nn, 3, self.num_heads, C // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.num_heads) ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(Bb, Nn, C)
        return self.proj(x)


class TBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TBlocks(tnn.Module):
    """Named ``blocks.blocks.{i}`` like the reference TransformerEncoder_h."""

    def __init__(self, dim, depth, heads):
        super().__init__()
        self.blocks = tnn.ModuleList([TBlock(dim, heads) for _ in range(depth)])

    def forward(self, x, pos, extract):
        taps = []
        for i, b in enumerate(self.blocks):
            x = b(x + pos)
            if i + 1 in extract:
                taps.append(x)
        return taps


class TSharedMLP(tnn.Module):
    """erikwijmans SharedMLP naming: mlp.layer{i}.conv / .bn.bn."""

    class Layer(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, 1, bias=False)

            class BNWrap(tnn.Module):
                def __init__(self, c):
                    super().__init__()
                    self.bn = tnn.BatchNorm2d(c)

                def forward(self, x):
                    return self.bn(x)

            self.bn = BNWrap(cout)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def __init__(self, chans):
        super().__init__()
        for i in range(len(chans) - 1):
            setattr(self, f"layer{i}", self.Layer(chans[i], chans[i + 1]))
        self.n = len(chans) - 1

    def forward(self, x):
        for i in range(self.n):
            x = getattr(self, f"layer{i}")(x)
        return x


class TFP(tnn.Module):
    def __init__(self, chans):
        super().__init__()
        self.mlp = TSharedMLP(chans)

    def forward(self, unknown, known, unknown_feats_cf, known_feats_cf):
        # channels-first feats (B, C, n) like the reference
        interp = t_three_interp(unknown, known,
                                known_feats_cf.transpose(1, 2)).transpose(1, 2)
        if unknown_feats_cf is not None:
            interp = torch.cat([interp, unknown_feats_cf], dim=1)
        return self.mlp(interp.unsqueeze(-1)).squeeze(-1)


class TDGCNN(tnn.Module):
    def __init__(self, dim, k=4):
        super().__init__()
        hidden = 4 * dim // 3
        self.k = k
        self.layer1 = tnn.Sequential(tnn.Conv2d(2 * dim, hidden, 1, bias=False),
                                     tnn.GroupNorm(4, hidden),
                                     tnn.LeakyReLU(0.2))
        self.layer2 = tnn.Sequential(tnn.Conv2d(2 * hidden, dim, 1, bias=False),
                                     tnn.GroupNorm(4, dim),
                                     tnn.LeakyReLU(0.2))

    def graph(self, q_xyz, q_f, k_xyz, k_f):
        idx = t_knn(q_xyz, k_xyz, self.k)                      # (B, Nq, k)
        neigh = torch.stack([f.transpose(0, 1)[i] for f, i in
                             zip(k_f, idx)])                   # (B, Nq, k, C)
        center = q_f.transpose(1, 2).unsqueeze(2).expand_as(neigh)
        edge = torch.cat([neigh - center, center], dim=-1)     # (B, Nq, k, 2C)
        return edge.permute(0, 3, 1, 2)

    def forward(self, c_xyz, c_f, f_xyz, f_f):
        h = self.layer1(self.graph(f_xyz, f_f, c_xyz, c_f)).max(-1).values
        h = self.layer2(self.graph(f_xyz, h, f_xyz, h)).max(-1).values
        return h


class TSegT(tnn.Module):
    """torch oracle with reference state_dict naming, wrapped as
    ``segmentor.`` by the test."""

    def __init__(self):
        super().__init__()
        self.encoder = tnn.Module()
        self.encoder.first_conv = tnn.Sequential(
            tnn.Conv1d(3, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
            tnn.Conv1d(128, 256, 1))
        self.encoder.second_conv = tnn.Sequential(
            tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, ENC, 1))
        self.reduce_dim = tnn.Linear(ENC, D)
        self.pos_embed = tnn.Sequential(tnn.Linear(3, 128), tnn.GELU(),
                                        tnn.Linear(128, D))
        self.blocks = TBlocks(D, DEPTH, HEADS)
        self.norm = tnn.LayerNorm(D)
        self.propogation_2 = TFP([D + 3, D * 4, D])
        self.propogation_1 = TFP([D + 3, D * 4, D])
        self.propogation_0 = TFP([D + 3 + 2, D * 4, D])
        self.dgcnn_pro_1 = TDGCNN(D)
        self.dgcnn_pro_2 = TDGCNN(D)
        self.seg_head = tnn.Sequential(tnn.Conv1d(D, 128, 1), tnn.BatchNorm1d(128),
                                       tnn.Dropout(0.5), tnn.Conv1d(128, NCLS, 1))
        self.T_revision = tnn.Linear(NCLS, NCLS, bias=False)
        self.T_linear = tnn.Linear(NCLS, NCLS, bias=False)
        tnn.init.constant_(self.T_linear.weight, 0.0)
        tnn.init.constant_(self.T_revision.weight, 0.0)
        self.sigma = tnn.Parameter(torch.full((NCLS,), 0.4))

    def forward(self, pts, cls_label, T=None):
        Bb, Nn, _ = pts.shape
        max_n = max(max(TARGETS), GROUPS)
        fps_idx = np.stack([np_fps(np.asarray(pts[b]), max_n) for b in range(Bb)])
        fps_pts = torch.stack([pts[b][fps_idx[b]] for b in range(Bb)])
        center = fps_pts[:, :GROUPS]
        nidx = t_knn(center, pts, GSIZE)
        neigh = torch.stack([pts[b][nidx[b]] for b in range(Bb)])
        neigh = neigh - center.unsqueeze(2)                    # (B, G, K, 3)

        # mini-PointNet (channels-first convs, reference ``Encoder``)
        pg = neigh.reshape(Bb * GROUPS, GSIZE, 3).transpose(2, 1)
        feat = self.encoder.first_conv(pg)                     # (BG, 256, K)
        g = feat.max(dim=2, keepdim=True).values
        feat = torch.cat([g.expand(-1, -1, GSIZE), feat], dim=1)
        feat = self.encoder.second_conv(feat)
        tokens = feat.max(dim=2).values.reshape(Bb, GROUPS, ENC)
        tokens = self.reduce_dim(tokens)
        pos = self.pos_embed(center)
        taps = self.blocks(tokens, pos, EXTRACT)
        taps = [self.norm(t).transpose(1, 2) for t in taps]    # (B, D, G)

        onehot = F.one_hot(cls_label.reshape(-1), 2).float()
        f_l0 = torch.cat([onehot.unsqueeze(-1).expand(-1, -1, Nn),
                          pts.transpose(1, 2)], dim=1)         # (B, 5, N)

        cpts = [fps_pts[:, :t] for t in TARGETS]
        f_l3 = taps[2]
        f_l2 = self.propogation_2(cpts[1], center, cpts[1].transpose(1, 2), taps[1])
        f_l1 = self.propogation_1(cpts[0], center, cpts[0].transpose(1, 2), taps[0])
        f_l2 = self.dgcnn_pro_2(center, f_l3, cpts[1], f_l2)
        f_l1 = self.dgcnn_pro_1(cpts[1], f_l2, cpts[0], f_l1)
        f_l0 = self.propogation_0(pts, cpts[0], f_l0, f_l1)
        logit = self.seg_head(f_l0)                            # (B, C, N)
        corr = self.T_linear(T) if T is not None else None
        return logit, corr


@pytest.mark.slow
def test_flagship_logit_parity():
    torch.manual_seed(0)
    oracle = TSegT().eval()
    # give BN non-trivial running stats so the converter path is exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.05, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    sd = {"segmentor." + k: v for k, v in oracle.state_dict().items()}
    params, stats = convert_torch_seg_t(sd, depth=DEPTH)

    model = build_model_from_cfg({
        "NAME": "WholePartSeg",
        "segmentor_args": {
            "NAME": "PointTransformer_seg_T", "trans_dim": D, "depth": DEPTH,
            "num_heads": HEADS, "group_size": GSIZE, "num_group": GROUPS,
            "encoder_dims": ENC, "nclasses": NCLS, "drop_path_rate": 0.1,
            "downsample_targets": TARGETS, "extract_layers": EXTRACT}})

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    cls = np.zeros((B, 1), dtype=np.int64)
    T = np.eye(NCLS, dtype=np.float32) * 0.9 + 0.1 / NCLS

    with torch.no_grad():
        t_logit, t_corr = oracle(torch.from_numpy(pts), torch.from_numpy(cls),
                                 torch.from_numpy(T))
    t_logit = t_logit.transpose(1, 2).numpy()                   # (B, N, C)

    variables = {"params": params, "batch_stats": stats}
    batch = {"pos": jnp.asarray(pts), "x": jnp.asarray(pts),
             "cls": jnp.asarray(cls)}
    u0 = {k + s: batch[k] for k in ("pos", "x", "cls") for s in ("_w", "_s")}
    j_logit, j_corr, j_sigma, _ = model.apply(variables, batch)
    # T-correction parity via the fixmatch path
    u0["T"] = jnp.asarray(T)
    fix_out = model.apply(variables, batch, u0=u0, fixmatch=True)
    j_corr = fix_out[1]

    j = np.asarray(j_logit)
    diff = np.abs(j - t_logit)
    assert diff.max() < 2e-3, f"max logit diff {diff.max()}"
    # same argmax predictions everywhere
    assert (j.argmax(-1) == t_logit.argmax(-1)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(j_corr), t_corr.numpy(), atol=1e-5)
