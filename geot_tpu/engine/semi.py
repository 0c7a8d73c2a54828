"""Noise-transition-matrix (NTM) estimation + FixMatch bookkeeping.

Pure-function redesign of the per-batch loops in ``train_one_epoch``
(reference ``examples/segmentation/train.py:502-644``): the reference builds
``class_T`` with a python loop over classes and ``prior_T`` with a nested
class loop; here both are single vectorised expressions (argmax-gather and a
precomputed FDI-adjacency distance matrix).

Two DELIBERATE deviations from the reference (both reference bugs, fixed
here and documented — same policy as the cm-bootstrap row-indexing fix):

1. Row normalisation: the reference's ``x / torch.sum(x, 1)`` (train.py:538,
   541, 544, 558) is missing ``keepdim=True``, so the (C,) row-sum vector
   broadcasts over the LAST axis — entry [i, j] is divided by row j's sum,
   not row i's.  Every normalisation here divides by the row's own sum
   (``keepdims=True``), which is what a transition matrix requires
   (rows sum to 1).
2. ``filter_outlier`` quantile zeroing: the reference zeroes through a VIEW
   (``robust_eta = eta_corr[:, cc, :]; robust_eta[...] = 0`` mutates
   ``eta_corr`` in place, train.py:511-513), so anchor rows gathered later
   (``class_T[cc] = eta_corr[idx_best0, :, idx_best1]``) carry zeros at
   already-processed classes — making class_T depend on the class iteration
   order.  Here the zeroing affects only anchor SELECTION; the gathered
   anchor row is the unmutated softmax.

Both bugs can be REPRODUCED with ``cfg.reference_bugs: true`` (plumbed
through ``steps.make_semi_step`` -> ``ntm_update(reference_bugs=True)``) so
step-for-step trajectory comparison against a real torch run is possible if
a torch environment ever materialises (VERDICT r3 #8); the torch-loop oracle
test is ``tests/test_reference_bugs_compat.py``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# FDI adjacency projection: physical neighbourhood order of the 17 classes
# (reference ``train.py:48``)
LABEL_PROJ = np.array([0, 8, 7, 6, 5, 4, 3, 2, 1, 9, 10, 11, 12, 13, 14, 15, 16])

# (C, C) squared distances in projected label space, precomputed once
_PROJ_D2 = (LABEL_PROJ[:, None].astype(np.float32) -
            LABEL_PROJ[None, :].astype(np.float32)) ** 2


def estimate_class_T(probs_u: jnp.ndarray, filter_outlier: bool = False,
                     quantile: float = 0.97,
                     reference_bugs: bool = False) -> jnp.ndarray:
    """Anchor-point class transition matrix: row c is the softmax row of the
    most-confident point for class c (reference ``train.py:506-526``).

    probs_u: (B, N, C) weak-view softmax probabilities (already detached).

    ``reference_bugs=True`` reproduces the reference's ``filter_outlier``
    view-mutation (``train.py:511-513``): the class-cc iteration zeroes
    ``eta_corr[:, cc, :]`` in place, so the row gathered for class cc
    carries zeros at every already-processed class cc' <= cc where that
    anchor point's probability exceeded cc'-s quantile.  Anchor SELECTION
    is unaffected (each column is mutated exactly once, before its own
    argmax) — only the gathered rows differ."""
    C = probs_u.shape[-1]
    flat = probs_u.reshape(-1, C)                               # (M, C)
    scores = flat
    if filter_outlier:
        thresh = jnp.quantile(flat, quantile, axis=0, keepdims=True)
        zero_mask = flat >= thresh
        scores = jnp.where(zero_mask, 0.0, flat)
    idx_best = jnp.argmax(scores, axis=0)                        # (C,)
    rows = flat[idx_best]                                        # (C, C)
    if filter_outlier and reference_bugs:
        mask_rows = zero_mask[idx_best]                          # (C, C)
        col = jnp.arange(C)[None, :]
        row = jnp.arange(C)[:, None]
        rows = jnp.where(mask_rows & (col <= row), 0.0, rows)
    return rows


def _row_normalize(x: jnp.ndarray, reference_bugs: bool = False):
    """Transition-matrix row normalisation.

    The reference's ``x / torch.sum(x, 1)`` (train.py:538,541,544,558) is
    missing ``keepdim=True``: the (C,) row-sum vector broadcasts over the
    LAST axis, dividing entry [i, j] by row j's sum instead of row i's.
    ``reference_bugs=True`` reproduces that for trajectory-level comparison
    against a real torch run; default is the correct row normalisation."""
    s = jnp.sum(x, axis=1)
    return x / s[None, :] if reference_bugs else x / s[:, None]


def gaussian_prior_T(sigma: jnp.ndarray,
                     reference_bugs: bool = False) -> jnp.ndarray:
    """Geometry prior: row c is a gaussian over projected-label distance with
    the model's learnable per-class sigma (reference ``train.py:528-538``).
    Row 0 (gum) is the delta at [0,0]; column 0 is zeroed for teeth rows."""
    C = sigma.shape[0]
    d2 = jnp.asarray(_PROJ_D2[:C, :C])
    s = sigma[:, None]
    prior = jnp.exp(-d2 / (2.0 * s * s)) / (s * jnp.sqrt(2.0 * jnp.pi))
    prior = prior.at[:, 0].set(0.0)
    prior = prior.at[0, :].set(0.0)
    prior = prior.at[0, 0].set(1.0)
    return _row_normalize(prior, reference_bugs)


class NTMUpdate(NamedTuple):
    ema_t: jnp.ndarray        # persistent state (class_T EMA)
    ema_t_corr: jnp.ndarray   # geometry-corrected EMA used for the step
    class_T: jnp.ndarray


def ntm_update(ema_t: jnp.ndarray, probs_u: jnp.ndarray, sigma: jnp.ndarray,
               geo_lambda: float = 0.999, ema_t_decay: float = 0.999,
               filter_outlier: bool = False,
               reference_bugs: bool = False) -> NTMUpdate:
    """One step of the NTM state machine (reference ``train.py:505-557``):

    - ``class_T`` from the batch anchors,
    - ``new_T`` = geo_lambda * class_T + (1-geo_lambda) * gaussian prior,
      with row 0 taken from class_T, row-normalised,
    - ``ema_t_corr`` = EMA(ema_t, new_T) — differentiable through sigma,
    - persistent ``ema_t`` = EMA(ema_t, class_T) — stop-gradient.

    ``reference_bugs=True`` (cfg flag of the same name) reproduces the two
    documented reference bugs — broadcast row normalisation and the
    filter_outlier view mutation — for step-for-step trajectory comparison
    against a real torch run (VERDICT r3 #8).
    """
    class_T = jax.lax.stop_gradient(
        estimate_class_T(probs_u, filter_outlier,
                         reference_bugs=reference_bugs))
    prior_T = gaussian_prior_T(sigma, reference_bugs)
    new_T = geo_lambda * class_T + (1.0 - geo_lambda) * prior_T
    new_T = new_T.at[0].set(class_T[0])
    new_T = _row_normalize(new_T, reference_bugs)

    ema_t_corr = ema_t * ema_t_decay + new_T * (1.0 - ema_t_decay)
    ema_t_corr = _row_normalize(ema_t_corr, reference_bugs)

    new_ema_t = ema_t * ema_t_decay + class_T * (1.0 - ema_t_decay)
    new_ema_t = _row_normalize(new_ema_t, reference_bugs)
    return NTMUpdate(ema_t=jax.lax.stop_gradient(new_ema_t),
                     ema_t_corr=ema_t_corr, class_T=class_T)


def combine_T(ema_t_corr: jnp.ndarray, ins_T: jnp.ndarray,
              lambda_: float = 0.9) -> jnp.ndarray:
    """newT = lambda * ema_t_corr + (1-lambda) * ins_T, row-L1-normalised
    (reference ``train.py:549-550``). ins_T: (M, C, C)."""
    newT = lambda_ * ema_t_corr[None] + (1.0 - lambda_) * ins_T
    return newT / jnp.sum(jnp.abs(newT), axis=2, keepdims=True)


def apply_T(logits: jnp.ndarray, newT: jnp.ndarray) -> jnp.ndarray:
    """Per-point logit correction: row-vector x matrix
    (reference ``train.py:551-552``). logits (B, N, C), newT (B*N, C, C)."""
    B, N, C = logits.shape
    flat = logits.reshape(B * N, 1, C)
    out = jnp.matmul(flat, newT, preferred_element_type=jnp.float32)
    return out.reshape(B, N, C)


def pseudo_stats(pseudo_label, target_u, conf, thresh: float, num_classes: int):
    """Pseudo-label accuracy / coverage / recall diagnostics
    (reference ``train.py:607-644``), vectorised over classes."""
    mask = (conf >= thresh)
    maskf = mask.astype(jnp.float32)
    total = pseudo_label.size
    over_th = jnp.sum(maskf) / total * 100.0
    correct = (pseudo_label == target_u)
    denom = jnp.sum(maskf)
    overall_acc = jnp.where(denom > 0,
                            jnp.sum(correct * maskf) / jnp.maximum(denom, 1) * 100.0,
                            0.0)

    onehot_p = jax.nn.one_hot(pseudo_label.reshape(-1), num_classes)   # (M, C)
    onehot_g = jax.nn.one_hot(target_u.reshape(-1), num_classes)
    mflat = maskf.reshape(-1, 1)
    hit = onehot_p * onehot_g
    acc_den = jnp.sum(onehot_p * mflat, axis=0)
    acc_cls = jnp.where(acc_den > 0,
                        jnp.sum(hit * mflat, axis=0) / jnp.maximum(acc_den, 1) * 100,
                        0.0)
    cov_den = jnp.sum(onehot_p, axis=0)
    cov_cls = jnp.where(cov_den > 0,
                        jnp.sum(onehot_p * mflat, axis=0) / jnp.maximum(cov_den, 1) * 100,
                        0.0)
    rec_den = jnp.sum(onehot_g, axis=0)
    rec_cls = jnp.where(rec_den > 0,
                        jnp.sum(hit * mflat, axis=0) / jnp.maximum(rec_den, 1) * 100,
                        0.0)

    fg_p = (pseudo_label > 0).astype(jnp.float32)
    fg_g = (target_u > 0).astype(jnp.float32)
    over_th_wobg = jnp.sum(maskf * fg_p) / jnp.maximum(jnp.sum(fg_p), 1) * 100
    den = jnp.sum(fg_p * maskf)
    over_acc_wobg = jnp.where(
        den > 0, jnp.sum(correct * fg_p * maskf) / jnp.maximum(den, 1) * 100, 0.0)
    return {
        "over_th": over_th,
        "pseudo_acc": overall_acc,
        "pseudo_acc_classwise": acc_cls,
        "over_th_classwise": cov_cls,
        "over_th_recall_classwise": rec_cls,
        "over_th_wobg": over_th_wobg,
        "over_acc_wobg": over_acc_wobg,
    }
