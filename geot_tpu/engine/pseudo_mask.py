"""Pseudo-label refinement via spatial-neighbour probability fusion.

Reference: ``utils/pseudo_mask.py`` — the CUDA-kNN neighbour gather loop
(``get_neigbor_tensors``, ``:5-35``) plus noisy-OR fusion refinements
(``pseudo_label_refine*``, ``:38-170``).  All channels-last (B, N, C) and one
kNN + one gather instead of the reference's per-neighbour ``index_select``
loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grouping_operation, knn

# empirical per-class neighbour-agreement joint probabilities
# (reference ``pseudo_mask.py:56-61``)
E_JOINT = np.array([
    0.9698153347167245, 0.9595924029774019, 0.9596092881209647,
    0.9617471101196512, 0.9662687092798028, 0.9684095068416779,
    0.9766432433032493, 0.9754884408811396, 0.9629032258064516,
    0.9596091749248413, 0.9584221215955251, 0.9619788870996601,
    0.9666700999073025, 0.968204136476084, 0.9760611218051148,
    0.9746949382049295, 0.966996699669967], dtype=np.float32)

BETA = float(np.exp(-0.5))


def get_neighbor_probs(probs: jnp.ndarray, pos: jnp.ndarray, n: int):
    """probs (B, N, C), pos (B, N, 3) -> neighbour probs (B, N, n, C) and
    distances (B, N, n), self excluded (reference ``get_neigbor_tensors``)."""
    dist, idx = knn(pos, pos, n + 1)
    idx, dist = idx[:, :, 1:], dist[:, :, 1:]
    return grouping_operation(probs, idx), dist


def pseudo_label_refine(probs: jnp.ndarray, th: float, pos: jnp.ndarray,
                        neighborhood_size: int = 4, n_neighbors: int = 1):
    """Noisy-OR fusion with the top-confidence neighbours, then confidence
    threshold (reference ``pseudo_mask.py:38-53``).  Returns the bool mask."""
    neigh, _ = get_neighbor_probs(probs, pos, neighborhood_size)
    # top_k over the neighbour axis, per class: (B, N, C, n_neighbors)
    top = jax.lax.top_k(jnp.swapaxes(neigh, 2, 3), n_neighbors)[0]
    fused = probs
    for j in range(n_neighbors):
        q = top[..., j]
        fused = fused + BETA * q - BETA * fused * q
    conf = jnp.max(jax.lax.stop_gradient(fused), axis=-1)
    return conf >= th


def pseudo_label_refine_margin(probs: jnp.ndarray, th: float, pos: jnp.ndarray,
                               neighborhood_size: int = 4, n_neighbors: int = 1):
    """Fusion + top1-top2 margin thresholding
    (reference ``pseudo_mask.py:55-90``). Returns (mask, margin)."""
    neigh, _ = get_neighbor_probs(probs, pos, neighborhood_size)
    top = jax.lax.top_k(jnp.swapaxes(neigh, 2, 3), n_neighbors)[0]
    fused = probs
    for j in range(n_neighbors):
        q = top[..., j]
        fused = fused + BETA * q - BETA * fused * q
    top2 = jax.lax.top_k(jax.lax.stop_gradient(fused), 2)[0]
    margin = top2[..., 0] - top2[..., 1]
    return margin >= th, margin


def pseudo_label_refine_margin_v1(probs: jnp.ndarray, th: float,
                                  drop_percent: float, pos: jnp.ndarray,
                                  neighborhood_size: int = 4,
                                  n_neighbors: int = 1):
    """Variant with per-class joint-probability upper bounds
    (reference ``pseudo_mask.py:92-170``). Returns (mask, margin, th)."""
    C = probs.shape[-1]
    E = jnp.asarray(E_JOINT[:C]).reshape(1, 1, C)
    neigh, _ = get_neighbor_probs(probs, pos, neighborhood_size)
    top = jax.lax.top_k(jnp.swapaxes(neigh, 2, 3), n_neighbors)[0]
    fused = probs
    for j in range(n_neighbors):
        q = top[..., j]
        upper = E * fused / jnp.maximum(q, 1e-8)
        fused = fused + q - fused * upper
    top2 = jax.lax.top_k(jax.lax.stop_gradient(fused), 2)[0]
    margin = top2[..., 0] - top2[..., 1]
    return margin >= th, margin, th


class NeighborAccCounter:
    """Per-class nearest-neighbour label-agreement statistics
    (reference ``neigh_acc_count``, ``pseudo_mask.py:174-196``)."""

    def __init__(self, num_classes: int = 17):
        self.num_classes = num_classes
        self.acc = np.zeros((num_classes, 2), dtype=np.int64)

    def update(self, pred, pos):
        pred = jnp.asarray(pred)
        _, idx = knn(pos, pos, 2)
        nn_pred = jnp.take_along_axis(pred, idx[:, :, 1], axis=1)
        agree = np.asarray(pred == nn_pred)
        pred_np = np.asarray(pred)
        for c in range(self.num_classes):
            mask = pred_np == c
            self.acc[c, 0] += int(mask.sum())
            self.acc[c, 1] += int((agree & mask).sum())

    @property
    def rates(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.acc[:, 1] / np.maximum(self.acc[:, 0], 1)
