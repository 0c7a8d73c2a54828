"""Student-vs-teacher point InfoNCE with a memory bank — fixed-shape redesign
of ``nativeContrastLoss_t`` (reference ``utils/cluster_contrastloss.py:1188-1408``).

The reference selects a *dynamic* number of confident points per cloud
(``nonzero`` + ``randperm``) and mutates a queue in-place.  Under jit both are
redesigned:

- selection: a gumbel-perturbed top-S over the confidence mask picks exactly
  ``sample_nums`` random confident points per cloud, with a validity mask for
  clouds holding fewer than S confident points (statistics preserved: uniform
  random subset of the confident set);
- queue: explicit ``ContrastState`` (bank + ptr) carried in the train-state
  pytree; the update is a mod-indexed scatter, returning a new state.

Positive pairs are the SAME point in student vs teacher feature space; all
other selected points and the bank are negatives.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ContrastState(NamedTuple):
    queue: jnp.ndarray   # (Q, D) L2-normalised teacher features
    ptr: jnp.ndarray     # () int32

    @staticmethod
    def create(rng, queue_size: int = 4096, dim: int = 128):
        q = jax.random.normal(rng, (queue_size, dim))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return ContrastState(queue=q, ptr=jnp.zeros((), jnp.int32))


def _select_confident(rng, score, sample_nums):
    """Per-cloud uniform random subset of {i: score_i >= th}, fixed size.
    Returns (idx (B, S), valid (B, S) bool)."""
    B, N = score.shape
    mask = score  # bool (B, N)
    g = jax.random.uniform(rng, (B, N))
    # key: confident points sorted above non-confident, random within each side
    key = jnp.where(mask, g + 1.0, g)
    _, idx = jax.lax.top_k(key, sample_nums)
    valid = jnp.take_along_axis(mask, idx, axis=1)
    return idx, valid


def contrast_loss_t(state: ContrastState, rng, feat_s, score, feat_t,
                    threshold: float = 0.9, sample_nums: int = 1024,
                    temperature: float = 0.1, base_temperature: float = 1.0):
    """Returns (loss, new_state).

    feat_s/feat_t: (B, N, D) student/teacher point features; score: (B, N)
    teacher confidence.  Mirrors ``forward`` + ``_ppc_contrastive_andbank`` +
    ``_queue_operations`` (reference ``:1278-1408``).
    """
    B, N, D = feat_s.shape
    sample_nums = min(sample_nums, N)
    feat_s = feat_s / (jnp.linalg.norm(feat_s, axis=-1, keepdims=True) + 1e-12)
    feat_t = feat_t / (jnp.linalg.norm(feat_t, axis=-1, keepdims=True) + 1e-12)

    sel_rng, q_rng = jax.random.split(rng)
    idx, valid = _select_confident(sel_rng, score >= threshold, sample_nums)
    anchors = jnp.take_along_axis(feat_s, idx[..., None], axis=1)   # (B,S,D)
    targets = jnp.take_along_axis(feat_t, idx[..., None], axis=1)
    anchors = anchors.reshape(B * sample_nums, D)
    targets = targets.reshape(B * sample_nums, D)
    valid = valid.reshape(B * sample_nums)

    M = anchors.shape[0]
    logits = (anchors @ targets.T) / temperature                    # (M, M)
    logits_max = jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    logits = logits - logits_max

    bank = (anchors @ state.queue.T) / temperature                  # (M, Q)
    # the bank logits get their OWN max shift, distinct from the in-batch
    # shift above — bug-compatible with the reference, which also mixes the
    # two exp scales (``_ppc_contrastive_andbank``: separate ``logits_max``
    # and ``logits_max_neg`` detached shifts before one shared denominator)
    bank_max = jax.lax.stop_gradient(jnp.max(bank, axis=1, keepdims=True))
    bank = bank - bank_max

    pos_mask = jnp.eye(M) * valid[None, :]                           # positives: self only
    neg_mask = (1.0 - jnp.eye(M)) * valid[None, :]
    neg_logits = jnp.sum(jnp.exp(logits) * neg_mask, axis=1, keepdims=True)
    neg_logits = neg_logits + jnp.sum(jnp.exp(bank), axis=1, keepdims=True)
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_logits)
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1)         # diag term
    per = -(temperature / base_temperature) * mean_log_prob_pos
    n_valid = jnp.sum(valid.astype(per.dtype))
    loss = jnp.sum(per * valid) / jnp.maximum(n_valid, 1.0)
    loss = jnp.where(n_valid > 0, loss, 0.0)

    # queue update: random subset of the valid targets, mod-indexed scatter
    perm = jax.random.permutation(q_rng, M)
    take = perm[: sample_nums]
    feats_in = jax.lax.stop_gradient(targets[take])
    ok = valid[take]
    Q = state.queue.shape[0]
    slots = (state.ptr + jnp.cumsum(ok.astype(jnp.int32)) - 1) % Q
    slots = jnp.where(ok, slots, Q)                                  # drop row Q
    queue = jnp.concatenate([state.queue, jnp.zeros((1, D))], axis=0)
    queue = queue.at[slots].set(feats_in)[:Q]
    new_ptr = (state.ptr + jnp.sum(ok.astype(jnp.int32))) % Q
    return loss, ContrastState(queue=queue, ptr=new_ptr)
