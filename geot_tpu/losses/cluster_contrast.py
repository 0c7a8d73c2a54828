"""Class-prototype cluster-contrast losses.

Reference: ``utils/cluster_contrastloss.py:10-1185`` —
``nativeContrastLoss_class`` (per-class EMA prototype centers + per-class
ring-buffer pixel queues; ppc anchor-vs-anchor InfoNCE with queue negatives +
pcc anchor-vs-center), ``nativeContrastLoss_subclass`` (confidence-quantile
subclasses) and ``nativeContrastLoss_subclass_t`` (teacher-feature contrast).

Fixed-shape redesign (SURVEY.md §7 hard-part 3): the reference's dynamic
``nonzero``/``randperm`` per-class sampling becomes a gumbel-perturbed top-k
over priority keys — per (cloud, class) exactly ``n_view`` slots are drawn,
half prioritised to *hard* points (predicted c but labelled otherwise), half
to *easy*, each slot carrying a validity flag.  Spillover between the
hard/easy halves is approximated by the key priorities rather than exact
counting; queue and center updates are mod-indexed scatters on an explicit
state pytree.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ClassContrastState(NamedTuple):
    centers: jnp.ndarray     # (P, D) L2-normalised EMA prototypes
    queues: jnp.ndarray      # (P, Q, D)
    ptrs: jnp.ndarray        # (P,) int32

    @staticmethod
    def create(rng, num_prototypes: int, dim: int = 64, queue_size: int = 150):
        r1, r2 = jax.random.split(rng)
        c = jax.random.normal(r1, (num_prototypes, dim))
        c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        q = jax.random.normal(r2, (num_prototypes, queue_size, dim))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return ClassContrastState(centers=c, queues=q,
                                  ptrs=jnp.zeros((num_prototypes,), jnp.int32))


def _sample_per_class(rng, pred, label, num_classes, n_view):
    """For each (cloud, class): n_view slots, hard points (pred==c, label!=c)
    prioritised into the first half, easy into the second, random within
    groups. Returns (idx (B, C, n_view), valid (B, C, n_view))."""
    B, N = pred.shape
    g = jax.random.uniform(rng, (B, N))
    half = n_view // 2

    idx_list, valid_list = [], []
    is_pred = jax.nn.one_hot(pred, num_classes, dtype=bool)          # (B, N, C)
    hard = is_pred & (label[..., None] != jnp.arange(num_classes))
    easy = is_pred & (label[..., None] == jnp.arange(num_classes))

    def per_class(hard_c, easy_c, gb):
        # keys: hard gets +3, easy +2 on the first half; swapped on second —
        # ensures each half prefers its own kind but backfills from the other
        key_hard_half = jnp.where(hard_c, gb + 3.0, jnp.where(easy_c, gb + 2.0, gb))
        key_easy_half = jnp.where(easy_c, gb + 3.0, jnp.where(hard_c, gb + 2.0, gb))
        _, i1 = jax.lax.top_k(key_hard_half, half)
        # exclude first-half picks from the second half
        taken = jnp.zeros_like(gb).at[i1].set(-10.0)
        _, i2 = jax.lax.top_k(key_easy_half + taken, n_view - half)
        idx = jnp.concatenate([i1, i2])
        member = hard_c | easy_c
        valid = member[idx]
        return idx, valid

    f = jax.vmap(jax.vmap(per_class, in_axes=(1, 1, None)), in_axes=(0, 0, 0))
    idx, valid = f(hard, easy, g)                                    # (B, C, n_view)
    return idx, valid


def _info_nce(anchors, contrast, pos_mask, contrast_valid=None,
              extra_neg=None, extra_neg_mask=None,
              temperature=0.1, base_temperature=1.0, drop_self=False,
              anchor_valid=None):
    """Shared InfoNCE core (reference ``_ppc_contrastive_v1``/``_pcc``,
    ``cluster_contrastloss.py:200-405``).

    In-batch different-class pairs are negatives in BOTH variants — the
    reference's queue variant keeps them too (``neg_logits_raw``,
    ``cluster_contrastloss.py:320-331``) and ADDS the queue negatives on top.
    ``contrast_valid`` masks padded fixed-shape slots out of the negative set
    (the reference's ragged sampling never produces invalid contrasts)."""
    M = anchors.shape[0]
    logits = (anchors @ contrast.T) / temperature
    if contrast_valid is not None:
        # padded slots may hold junk: keep them out of the row-max shift
        # (a junk max underflows every real logit) and out of the exp sums
        logits = jnp.where(contrast_valid[None, :], logits, -1e9)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, 1, keepdims=True))
    neg_mask = 1.0 - pos_mask          # before self-pair removal (ref :320)
    if contrast_valid is not None:
        neg_mask = neg_mask * contrast_valid[None, :].astype(neg_mask.dtype)
    if drop_self:
        eye = jnp.eye(M)
        pos_mask = pos_mask * (1 - eye)
        neg_mask = neg_mask * (1 - eye)
    neg_logits = jnp.sum(jnp.exp(logits) * neg_mask, axis=1, keepdims=True)
    if extra_neg is not None:
        ln = (anchors @ extra_neg.T) / temperature
        ln = ln - jax.lax.stop_gradient(jnp.max(ln, 1, keepdims=True))
        neg_logits = neg_logits + jnp.sum(jnp.exp(ln) * extra_neg_mask, 1,
                                          keepdims=True)
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_logits)
    pos_count = jnp.sum(pos_mask, axis=1)
    has_pos = pos_count > 0
    if anchor_valid is not None:
        has_pos = has_pos & anchor_valid
    mean_lp = jnp.sum(pos_mask * log_prob, axis=1) / jnp.maximum(pos_count, 1.0)
    per = -(temperature / base_temperature) * mean_lp
    denom = jnp.maximum(jnp.sum(has_pos.astype(per.dtype)), 1.0)
    return jnp.sum(jnp.where(has_pos, per, 0.0)) / denom


# reference confidence-quantile split boundaries for the K=6 subclass
# variants (``cluster_contrastloss.py:420`` K_split)
K_SPLIT = (0.95, 0.85, 0.75, 0.65, 0.55)


def _sample_subclass_quantile(rng, pred, conf, num_classes, K, n_view_bin):
    """Subclass sampling exactly as the reference's live
    ``_assigning_subclass_labels_cur`` branch (``cluster_contrastloss.py:
    560-583``): per (cloud, class) the confidence QUANTILES of the FULL
    member population split K bins ([1, q.95, q.85, ..., 0], descending);
    up to ``n_view_bin`` random members per bin.  A point exactly at a
    threshold lands in the lower-confidence bin (upstream's inclusive le/ge
    double-counts it — impossible fixed-shape, measure-zero for continuous
    confidences).

    Returns idx (B, C*K, n_view_bin), valid."""
    B, N = pred.shape
    member = jax.nn.one_hot(pred, num_classes, dtype=bool)        # (B, N, C)
    confm = jnp.where(member.transpose(0, 2, 1), conf[:, None, :],
                      jnp.nan)                                    # (B, C, N)
    qs = jnp.asarray(K_SPLIT[:K - 1])
    ths = jnp.nanquantile(confm, qs, axis=-1)                     # (K-1, B, C)
    ths = jnp.nan_to_num(ths, nan=jnp.inf)    # empty class: all bins empty-ish
    # bin id = number of thresholds >= conf (0 = most confident)
    bins = jnp.sum(ths[:, :, :, None] >= conf[None, :, None, :],
                   axis=0)                                        # (B, C, N)
    g = jax.random.uniform(rng, (B, N))

    def per_bin(member_bc, bins_bc, gb, kk):
        m = member_bc & (bins_bc == kk)
        key = jnp.where(m, gb + 2.0, gb)
        _, i = jax.lax.top_k(key, n_view_bin)
        return i, m[i]

    def per_class(member_bc, bins_bc, gb):
        i, v = jax.vmap(per_bin, in_axes=(None, None, None, 0))(
            member_bc, bins_bc, gb, jnp.arange(K))
        return i, v                                               # (K, V)

    f = jax.vmap(jax.vmap(per_class, in_axes=(1, 0, None)),
                 in_axes=(0, 0, 0))
    idx, valid = f(member, bins, g)                        # (B, C, K, V)
    return idx.reshape(B, num_classes * K, n_view_bin), \
        valid.reshape(B, num_classes * K, n_view_bin)


def class_contrast_loss(state: ClassContrastState, rng, feats, pred, label,
                        conf: Optional[jnp.ndarray] = None,
                        num_classes: int = 17, n_view: int = 100,
                        subclasses: int = 1, temperature: float = 0.1,
                        mu: float = 0.99, pixel_update: int = 30,
                        pcc_weight: float = 10.0,
                        teacher_feats: Optional[jnp.ndarray] = None):
    """One step of the cluster-contrast family; returns (loss, new_state).

    - ``subclasses=1``: ``nativeContrastLoss_class``.
    - ``subclasses=K>1``: the confidence-quantile subclass variants — per
      (cloud, class) the FULL member population is split by the reference's
      ``K_SPLIT`` confidence quantiles and up to ``n_view // K`` members are
      sampled per bin (reference ``cluster_contrastloss.py:560-583``).
    - ``teacher_feats`` given: ``_subclass_t`` — anchors are student features,
      the contrast set is the teacher's (positives = same (sub)class).

    feats/teacher_feats: (B, N, D); pred/label: (B, N) int; conf: (B, N).
    """
    B, N, D = feats.shape
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    if teacher_feats is not None:
        teacher_feats = teacher_feats / (
            jnp.linalg.norm(teacher_feats, axis=-1, keepdims=True) + 1e-12)

    samp_rng, q_rng = jax.random.split(rng)
    if subclasses > 1 and conf is not None:
        n_view_bin = n_view // subclasses     # reference: n_view = 100 // K
        idx, valid = _sample_subclass_quantile(
            samp_rng, pred, conf, num_classes, subclasses, n_view_bin)
        slots_per_cloud = num_classes * subclasses * n_view_bin
        proto_ids = jnp.broadcast_to(
            jnp.arange(num_classes * subclasses)[None, :, None],
            idx.shape)
    else:
        n_view_bin = n_view
        idx, valid = _sample_per_class(samp_rng, pred, label, num_classes,
                                       n_view)
        slots_per_cloud = num_classes * n_view
        proto_ids = jnp.broadcast_to(
            jnp.arange(num_classes)[None, :, None], idx.shape)

    def gather(x):
        flat = idx.reshape(B, -1)
        return jnp.take_along_axis(x, flat[..., None], axis=1).reshape(
            B, idx.shape[1], idx.shape[2], -1)

    anchors = gather(feats)                               # (B, slots, V, D)
    contrast_src = gather(teacher_feats) if teacher_feats is not None else anchors

    P = num_classes * subclasses
    M = B * slots_per_cloud
    a = anchors.reshape(M, D)
    c = contrast_src.reshape(M, D)
    y = proto_ids.reshape(M)
    v = valid.reshape(M)

    same = (y[:, None] == y[None, :]).astype(jnp.float32)
    vmask = v[:, None].astype(jnp.float32) * v[None, :].astype(jnp.float32)
    pos_mask = same * vmask

    queue_flat = state.queues.reshape(-1, D)                  # (P*Q, D)
    q_ids = jnp.repeat(jnp.arange(P), state.queues.shape[1])
    queue_neg_mask = (y[:, None] != q_ids[None, :]).astype(jnp.float32)

    ppc = _info_nce(a, c, pos_mask, contrast_valid=v, extra_neg=queue_flat,
                    extra_neg_mask=queue_neg_mask, temperature=temperature,
                    drop_self=teacher_feats is None, anchor_valid=v)
    center_pos = jax.nn.one_hot(y, P) * v[:, None]
    pcc = _info_nce(a, state.centers, center_pos, temperature=temperature,
                    anchor_valid=v)
    loss = ppc + pcc_weight * pcc

    # --- state updates (stop-gradient) ---------------------------------
    a_sg = jax.lax.stop_gradient(c if teacher_feats is not None else a)
    vf = v.astype(jnp.float32)[:, None]
    sums = jax.ops.segment_sum(a_sg * vf, y, num_segments=P)
    counts = jax.ops.segment_sum(vf[:, 0], y, num_segments=P)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    new_centers = jnp.where(counts[:, None] > 0,
                            mu * state.centers + (1 - mu) * means,
                            state.centers)
    new_centers = new_centers / (jnp.linalg.norm(new_centers, axis=-1,
                                                 keepdims=True) + 1e-12)

    # queue: enqueue up to ``pixel_update`` random valid feats per prototype
    Q = state.queues.shape[1]
    g = jax.random.uniform(q_rng, (M,)) + v.astype(jnp.float32)
    take = min(pixel_update, n_view)

    def enqueue(qrow, ptr, pid):
        key = jnp.where(y == pid, g, -1.0)
        _, sel = jax.lax.top_k(key, take)
        ok = v[sel]
        slots = (ptr + jnp.cumsum(ok.astype(jnp.int32)) - 1) % Q
        slots = jnp.where(ok, slots, Q)
        padded = jnp.concatenate([qrow, jnp.zeros((1, D))], axis=0)
        new_q = padded.at[slots].set(a_sg[sel])[:Q]
        new_ptr = (ptr + jnp.sum(ok.astype(jnp.int32))) % Q
        return new_q, new_ptr

    new_queues, new_ptrs = jax.vmap(enqueue)(state.queues, state.ptrs,
                                             jnp.arange(P))
    new_state = ClassContrastState(centers=jax.lax.stop_gradient(new_centers),
                                   queues=jax.lax.stop_gradient(new_queues),
                                   ptrs=new_ptrs)
    return loss, new_state


def pseudo_label_from_prototype(state: ClassContrastState, feats,
                                num_classes: int, subclasses: int = 1):
    """Prototype-based pseudo-labels (reference
    ``pseudo_label_from_prototype``, ``cluster_contrastloss.py:750-768,
    1167-1185``): softmax over feature-center similarities; with subclasses
    the argmax prototype folds back to its class id.

    feats (B, N, D) -> (pseudo_label (B, N) int32, pseudo_logits (B, N))."""
    f = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    dist = jax.nn.softmax(f @ state.centers.T, axis=-1)       # (B, N, P)
    logits = jnp.max(dist, axis=-1)
    label = jnp.argmax(dist, axis=-1) // subclasses
    return label.astype(jnp.int32), logits


def pcc_top2_loss(state: ClassContrastState, rng, feats, label1, label2,
                  valid_mask, cur, num_classes: int, subclasses: int = 6,
                  n_view: int = 100, temperature: float = 0.1):
    """The ``_t`` variant's ambiguous-point prototype term (reference
    ``_assigning_subclass_labels_cur_top2`` + ``_pcc_contrastive_top2``,
    ``cluster_contrastloss.py:1005-1113``): points whose top-2 mask is set
    anchor against the centers with BOTH top-1 and top-2 (sub)class
    prototypes as positives.  ``label1``/``label2`` (B, N): top-1/top-2
    pseudo-labels; ``valid_mask`` (B, N): the top2 mask (reference masks the
    rest to ignore_label 255); ``cur`` (B, N): curvature/confidence used for
    the quantile bins."""
    K = subclasses
    n_view_bin = n_view // K
    B, N, D = feats.shape
    f = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    # masked points get class id ``num_classes`` -> dropped by one_hot width
    pred_m = jnp.where(valid_mask, label1, num_classes)
    idx, valid = _sample_subclass_quantile(rng, pred_m, cur, num_classes, K,
                                           n_view_bin)

    def g(x):
        flat = idx.reshape(B, -1)
        return jnp.take_along_axis(x, flat, axis=1).reshape(idx.shape)

    bins = jnp.broadcast_to(
        jnp.arange(num_classes * K)[None, :, None] % K, idx.shape)
    y1 = g(label1) * K + bins
    y2 = g(label2) * K + bins
    a = jnp.take_along_axis(f, idx.reshape(B, -1)[..., None],
                            axis=1).reshape(-1, D)
    P = num_classes * K
    pos = jnp.maximum(jax.nn.one_hot(y1.reshape(-1), P),
                      jax.nn.one_hot(y2.reshape(-1), P))
    v = valid.reshape(-1)
    pos = pos * v[:, None]
    return _info_nce(a, state.centers, pos, temperature=temperature,
                     anchor_valid=v)
