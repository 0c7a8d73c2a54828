"""Jit-compiled train/eval steps.

The reference's ``train_one_epoch`` (``examples/segmentation/train.py:410-713``)
interleaves host python with device work every iteration; here each phase of
the GeoT schedule is ONE fused jitted step over donated state:

- supervised step (epoch <= supervised_epochs),
- semi step with teacher pseudo-labels (epoch <= switch_ep),
- semi step with student-weak pseudo-labels (after switch_ep).

Phase switches are static booleans -> three XLA executables, compiled once.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..losses import build_criterion_from_cfg
from ..optim.factory import set_learning_rate
from ..losses.contrast import contrast_loss_t
from ..losses.inst_loss import feature_space_loss, identity_loss, threed_space_loss
from .semi import apply_T, combine_T, ntm_update, pseudo_stats
from .state import SemiTrainState, TrainState


def _logits_of(out):
    """Normalise a segmentation model's output to logits: the seg_T family
    returns ``(logit, correction, sigma, feats)`` (reference
    ``transformer.py:1055-1068``) while the generic BaseSeg/BasePartSeg/
    VariableSeg compositions return bare logits (reference ``base_seg.py:52``)
    — the engine trains/evaluates both."""
    return out[0] if isinstance(out, (tuple, list)) else out


def _sup_loss_fn(criterion, criterion_name, logits, batch):
    """Dispatch the supervised criterion exactly like the reference
    (``train.py:449-454, 576-581``)."""
    if criterion_name == "Weight_CELoss":
        return criterion(logits, batch["y"], batch["class_weights"])
    if criterion_name == "MultiShapeCrossEntropy":
        return criterion(logits, batch["y"], batch["cls"])
    return criterion(logits, batch["y"])


def _needs_hessian(cfg) -> bool:
    """True when the configured optimizer is AdaHessian (whose ``update``
    takes the extra ``hessian_diag`` pytree — see ``optim/adahessian.py``)."""
    name = str((cfg.get("optimizer") or {}).get("NAME", "")).lower()
    return "adahessian" in name


def _select_tree(pred, new, old):
    """Leafwise ``where(pred, new, old)`` over two same-structure pytrees."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred, n, o), new, old)


def _ema_update(ema_params, params, decay: float):
    """One Polyak step of the evaluation EMA (``cfg.ema_eval``).  No-op when
    the state was created without EMA (empty dict) or the decay is unset —
    both are trace-time constants, so disabled runs compile zero extra ops."""
    if not decay or not ema_params:
        return ema_params
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def _finite_guard(loss, *grad_trees):
    """True when the loss and every gradient are finite — the gate for
    ``skip_nonfinite_updates`` (production hardening beyond the reference,
    which has no overflow protection: one NaN batch poisons the run)."""
    ok = jnp.isfinite(loss)
    for g in grad_trees:
        ok = ok & jnp.isfinite(optax.global_norm(g))
    return ok


def make_supervised_step(model, tx, cfg) -> Callable:
    """Supervised warm-up step (reference ``train.py:439-457``)."""
    criterion = build_criterion_from_cfg(cfg["criterion_args"])
    criterion_name = cfg["criterion_args"]["NAME"]
    clip = cfg.get("grad_norm_clip")
    needs_hessian = _needs_hessian(cfg)
    skip_nonfinite = bool(cfg.get("skip_nonfinite_updates", False))
    ema_decay = float(cfg.get("ema_eval") or 0.0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, lr):
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.get("seed", 0)), state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, training=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            logits = _logits_of(out)
            loss = _sup_loss_fn(criterion, criterion_name, logits, batch)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        extra = {}
        if needs_hessian:
            # AdaHessian second backward: Hutchinson diag(H) via one jvp
            # through the grad fn (reference double backward,
            # ``openpoints/optim/adahessian.py:75-100``)
            from ..optim.adahessian import hutchinson_diag
            grad_only = lambda p: jax.grad(  # noqa: E731
                loss_fn, has_aux=True)(p)[0]
            extra["hessian_diag"] = hutchinson_diag(
                grad_only, state.params, jax.random.fold_in(rng, 0x5EC0))
        if clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params, **extra)
        params = optax.apply_updates(state.params, updates)
        ema_params = _ema_update(state.ema_params, params, ema_decay)
        metrics = {"loss": loss, "sup_loss": loss,
                   "unsup_loss": jnp.zeros(())}
        if skip_nonfinite:
            # skip the whole update on a non-finite loss/gradient: params,
            # optimizer state AND batch stats keep their previous values
            # (the poisoned forward also poisons the running stats); the
            # step counter still advances so the PRNG stream moves on
            ok = _finite_guard(loss, grads)
            params = _select_tree(ok, params, state.params)
            opt_state = _select_tree(ok, opt_state, state.opt_state)
            new_bs = _select_tree(ok, new_bs, state.batch_stats)
            ema_params = _select_tree(ok, ema_params, state.ema_params)
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
            metrics["loss"] = jnp.where(ok, loss, 0.0)
            metrics["sup_loss"] = metrics["loss"]
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt_state, step=state.step + 1,
                                  ema_params=ema_params)
        return new_state, metrics

    return step


def make_semi_step(model, teacher_model, t_predictor, tx, t_tx, cfg) -> Callable:
    """The full GeoT FixMatch + NTM step
    (reference ``train.py:459-669``), jitted over SemiTrainState.

    Returned callable: ``step(state, batch_l, batch_u, lr, use_teacher)`` with
    ``use_teacher`` static.
    """
    criterion = build_criterion_from_cfg(cfg["criterion_args"])
    criterion_name = cfg["criterion_args"]["NAME"]
    criterion_u = build_criterion_from_cfg(cfg["criterion_u_args"])
    criterion_u_name = cfg["criterion_u_args"]["NAME"]
    num_classes = int(cfg["num_classes"])
    clip = cfg.get("grad_norm_clip")
    needs_hessian = _needs_hessian(cfg)
    ema_decay = float(cfg.get("ema_eval") or 0.0)

    threshold = float(cfg.get("threshold", 0.0))
    unsup_w = float(cfg.get("unsupervised_loss_weight", 1.0))
    lambda_ = float(cfg.get("lambma", 0.9))
    geo_lambda = float(cfg.get("geo_lambma", 0.999))
    ema_t_decay = float(cfg.get("ema_t_decay", 0.999))
    filter_outlier = bool(cfg.get("filter_outlier", False))
    # reproduce the reference's two documented NTM bugs (broadcast row
    # normalisation + filter_outlier view mutation) for trajectory-level
    # comparison against a real torch run — see engine/semi.py
    reference_bugs = bool(cfg.get("reference_bugs", False))

    use_feat = bool(cfg.get("use_feat_loss", False))
    feat_loss = feature_space_loss(int(cfg.get("feat_k", 16)),
                                   float(cfg.get("feat_sigma", 1.0)), num_classes)
    feat_w = float(cfg.get("feat_loss_weight", 10.0))
    use_id = bool(cfg.get("use_identity_loss", False))
    id_loss = identity_loss()
    id_w = float(cfg.get("identity_loss_weight", 1.0))
    use_3d = bool(cfg.get("use_3d_loss", True))
    # threed_anchors=M computes the 3d manifold loss on M random anchor
    # points per cloud (unbiased estimator; neighbours still searched in
    # the full cloud) — 0 keeps the exact all-points reference semantics
    threed_anchors = int(cfg.get("threed_anchors", 0) or 0)
    td_loss = threed_space_loss(int(cfg.get("threed_k", 32)),
                                float(cfg.get("threed_sigma", 1.0)), num_classes,
                                anchors=threed_anchors)
    td_w = float(cfg.get("threed_loss_weight", 0.1))
    use_contrast = bool(cfg.get("use_contrastive", False))
    contrast_w = float(cfg.get("contrastive_loss_weight", 1.0))
    # teacher-confidence gate on contrast anchors; the reference hard-codes
    # 0.9 (``cluster_contrastloss.py`` nativeContrastLoss_t) — configurable
    # here because a from-scratch teacher may never clear 0.9 (the all-flags
    # evidence run lowers it to activate the path)
    contrast_th = float(cfg.get("contrast_threshold", 0.9))
    pseudo_refine = bool(cfg.get("pseudo_refine", False))

    b_l = int(cfg["batch_size_l"])
    b_u = int(cfg["batch_size_u"])
    skip_nonfinite = bool(cfg.get("skip_nonfinite_updates", False))

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def step(state: SemiTrainState, batch_l, batch_u, lr, use_teacher: bool):
        rng, drop_rng, contrast_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step), 3)

        teacher_probs = None
        teacher_feats = None
        if use_teacher:
            t_logits, *_rest = teacher_model.apply(
                state.teacher_variables, batch_u, if_teacher=True, training=False)
            teacher_feats = _rest[-1]
            teacher_probs = jax.nn.softmax(t_logits, axis=-1)

        def loss_fn(params_tuple):
            params, t_params = params_tuple
            u0 = dict(batch_u)
            u0["T"] = state.ema_t
            (logits, _corr, sigma, feats), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch_l, u0=u0, fixmatch=True, training=True,
                rngs={"dropout": drop_rng}, mutable=["batch_stats"])
            pred_l = logits[:b_l]
            pred_u_strong = logits[b_l:b_l + b_u]
            pred_u_weak = logits[b_l + b_u:]

            if use_teacher:
                probs_w = teacher_probs
            else:
                probs_w = jax.lax.stop_gradient(
                    jax.nn.softmax(pred_u_weak, axis=-1))
            conf = jnp.max(probs_w, axis=-1)
            pseudo = jnp.argmax(probs_w, axis=-1)
            refine_mask = None
            if pseudo_refine:
                # noisy-OR neighbour fusion mask (reference ``train.py``
                # pseudo_refine branch + ``utils/pseudo_mask.py:38``)
                from .pseudo_mask import pseudo_label_refine

                refine_mask = pseudo_label_refine(
                    probs_w, threshold, batch_u["raw_pos"])

            # --- NTM state machine -----------------------------------------
            ntm = ntm_update(state.ema_t, probs_w, sigma,
                             geo_lambda=geo_lambda, ema_t_decay=ema_t_decay,
                             filter_outlier=filter_outlier,
                             reference_bugs=reference_bugs)
            probs_s = jax.nn.softmax(pred_u_strong, axis=-1)
            ins_T = t_predictor.apply({"params": t_params},
                                      jax.lax.stop_gradient(probs_s), state.cm)
            newT = combine_T(ntm.ema_t_corr, ins_T, lambda_)
            pred_u_corr = apply_T(pred_u_strong, newT)

            # --- losses ----------------------------------------------------
            sup_loss = _sup_loss_fn(criterion, criterion_name, pred_l, batch_l)

            mask_override = None    # top2 widens the mask used for scale/stats
            if criterion_u_name == "Weight_CELoss_U":
                unsup = criterion_u(pred_u_strong, pseudo,
                                    batch_l["class_weights"], conf, thresh=threshold)
            elif criterion_u_name == "Poly1FocalLoss_U":
                # mask=refine_mask keeps the loss mask and the scale-factor
                # mask (thresh_mask below) consistent under pseudo_refine —
                # the reference dispatch passes its mask here too
                # (``train.py:589-590``, though its mask is always None)
                unsup = criterion_u(pred_u_strong, pseudo, conf,
                                    thresh=threshold, mask=refine_mask)
            elif criterion_u_name == "Poly1FocalLoss_U_T":
                unsup = criterion_u(pred_u_strong, pseudo, conf, ntm.ema_t,
                                    jax.nn.softmax(pred_u_corr, -1),
                                    thresh=threshold, mask=refine_mask)
            elif criterion_u_name == "Poly1FocalLoss_U_T_v1":
                # delta_T is the model's T-revision output (reference
                # ``train.py:490`` second return; loss ``build.py:691-795``)
                unsup, _delta = criterion_u(
                    pred_u_strong, pseudo, conf, ntm.ema_t, probs_w,
                    _corr if _corr is not None else jnp.zeros_like(ntm.ema_t),
                    thresh=threshold, mask=refine_mask)
            elif criterion_u_name == "Poly1FocalLoss_U_Cur":
                # curvature-gated mask (reference ``build.py:357-442``); the
                # loader supplies per-point curvature as ``cur`` when the
                # dataset carries it, else confidence gates as usual
                cur = batch_u.get("cur", conf)
                unsup = criterion_u(pred_u_strong, pseudo, conf,
                                    thresh=threshold, cur=cur)
            elif criterion_u_name == "Poly1FocalLoss_U_top2":
                # widened mask: confident points OR ambiguous points whose
                # top-2 labels swap with their nearest neighbour's
                # (reference ``build.py:445-560``); the widened mask also
                # feeds the scale/threshold bookkeeping below
                unsup, full_mask, _topk = criterion_u(
                    pred_u_strong, pseudo, conf, probs_w, batch_u["raw_pos"],
                    thresh=threshold, mask=refine_mask)
                mask_override = full_mask
            elif criterion_u_name == "MSE_Loss_U":
                unsup = criterion_u(pred_u_strong, probs_w, thresh=threshold)
            else:  # Poly1FocalLoss_U_corr — the config default
                unsup = criterion_u(pred_u_corr, pseudo, conf, thresh=threshold,
                                    mask=refine_mask)

            if mask_override is not None:
                thresh_mask = mask_override
            elif refine_mask is not None:
                thresh_mask = refine_mask
            else:
                thresh_mask = (conf >= threshold)
            scale = (b_u * conf.shape[-1]) / jnp.maximum(
                jnp.sum(thresh_mask.astype(jnp.float32)), 1.0)
            unsup = unsup * unsup_w * scale

            loss = sup_loss + unsup
            aux_losses = {}
            if use_feat:
                lf = feat_loss(probs_s, pseudo, ins_T) * feat_w
                loss = loss + lf
                aux_losses["feat_loss"] = lf
            if use_id:
                li = id_loss(ins_T) * id_w
                loss = loss + li
                aux_losses["identity_loss"] = li
            if use_3d:
                # anchor rng derived by fold_in so the existing dropout /
                # contrast streams (and their pinned trajectories) are
                # untouched when anchors are off
                l3 = td_loss(batch_u["raw_pos"], pseudo, ins_T,
                             rng=(jax.random.fold_in(drop_rng, 0x3D)
                                  if threed_anchors else None)) * td_w
                loss = loss + l3
                aux_losses["threed_loss"] = l3
            new_contrast = state.contrast
            if use_contrast and use_teacher:
                feat_s = feats[b_l:b_l + b_u]
                lc, new_contrast = contrast_loss_t(
                    state.contrast, contrast_rng, feat_s, conf, teacher_feats,
                    threshold=contrast_th)
                lc = lc * contrast_w
                loss = loss + lc
                aux_losses["contrast_loss"] = lc

            aux = dict(sup_loss=sup_loss, unsup_loss=unsup,
                       conf=conf, pseudo=pseudo,
                       pred_u_strong=jax.lax.stop_gradient(pred_u_strong),
                       new_bs=mutated["batch_stats"], ema_t=ntm.ema_t,
                       contrast=new_contrast, **aux_losses)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.t_params))
        g_model, g_t = grads
        extra, t_extra = {}, {}
        if needs_hessian:
            # ONE joint Hutchinson pass over (params, t_params) — the torch
            # reference also runs a single backward over all param groups;
            # separate per-tree passes would double the forward-over-reverse
            # jvp cost for the tiny T-predictor diagonal
            from ..optim.adahessian import hutchinson_diag
            joint_grad = lambda ps: jax.grad(  # noqa: E731
                loss_fn, has_aux=True)(ps)[0]
            h_model, h_t = hutchinson_diag(
                joint_grad, (state.params, state.t_params),
                jax.random.fold_in(rng, 0x5EC0))
            extra["hessian_diag"] = h_model
            t_extra["hessian_diag"] = h_t
        if clip is not None:
            gnorm = optax.global_norm(g_model)
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            g_model = jax.tree_util.tree_map(lambda g: g * scale, g_model)

        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(g_model, opt_state, state.params, **extra)
        params = optax.apply_updates(state.params, updates)

        t_opt_state = set_learning_rate(state.t_opt_state, lr)
        t_updates, t_opt_state = t_tx.update(g_t, t_opt_state, state.t_params,
                                             **t_extra)
        t_params = optax.apply_updates(state.t_params, t_updates)
        ema_params = _ema_update(state.ema_params, params, ema_decay)

        skipped = jnp.zeros(())
        if skip_nonfinite:
            # skip the whole update when the loss or any gradient is
            # non-finite: weights, both optimizers, batch stats AND the EMA
            # side-state (ema_t / contrast queue) keep their previous values
            # — one overflowing batch cannot poison the run (production
            # hardening beyond the reference)
            ok = _finite_guard(loss, g_model, g_t)
            params = _select_tree(ok, params, state.params)
            ema_params = _select_tree(ok, ema_params, state.ema_params)
            opt_state = _select_tree(ok, opt_state, state.opt_state)
            t_params = _select_tree(ok, t_params, state.t_params)
            t_opt_state = _select_tree(ok, t_opt_state, state.t_opt_state)
            aux["new_bs"] = _select_tree(ok, aux["new_bs"], state.batch_stats)
            aux["ema_t"] = _select_tree(ok, aux["ema_t"], state.ema_t)
            aux["contrast"] = _select_tree(ok, aux["contrast"], state.contrast)
            skipped = 1.0 - ok.astype(jnp.float32)
            loss = jnp.where(ok, loss, 0.0)

        # --- diagnostics (reference ``train.py:607-644``) -------------------
        target_u = batch_u["y"].reshape(aux["pseudo"].shape)
        stats = pseudo_stats(aux["pseudo"], target_u, aux["conf"], threshold,
                             num_classes)
        probs_strong = jax.nn.softmax(aux["pred_u_strong"], -1)
        student_label = jnp.argmax(probs_strong, -1)
        stats["teacher_acc"] = jnp.mean((aux["pseudo"] == target_u).astype(jnp.float32))
        stats["student_acc"] = jnp.mean((student_label == target_u).astype(jnp.float32))

        metrics = {"loss": loss, "sup_loss": aux["sup_loss"],
                   "unsup_loss": aux["unsup_loss"], **stats}
        if skip_nonfinite:
            metrics["skipped"] = skipped
        for k in ("feat_loss", "identity_loss", "threed_loss", "contrast_loss"):
            if k in aux:
                metrics[k] = aux[k]

        new_state = state.replace(
            params=params, batch_stats=aux["new_bs"], opt_state=opt_state,
            t_params=t_params, t_opt_state=t_opt_state,
            ema_t=aux["ema_t"], contrast=aux["contrast"],
            rng=rng, step=state.step + 1, ema_params=ema_params)
        return new_state, metrics

    return step


def make_eval_step(model) -> Callable:
    @jax.jit
    def step(variables, batch):
        logits = _logits_of(model.apply(variables, batch, training=False))
        return logits

    return step


def make_confusion_step(model, num_classes: int) -> Callable:
    """One batch of ``cal_confusion_matrix`` (reference ``train.py:841-866``):
    hard-label confusion counts, row-normalised by the host afterwards."""

    @jax.jit
    def step(variables, batch):
        logits = _logits_of(model.apply(variables, batch, training=False))
        pred = jnp.argmax(logits, axis=-1).reshape(-1)
        target = batch["y"].reshape(-1)
        onehot_t = jax.nn.one_hot(target, num_classes)
        onehot_p = jax.nn.one_hot(pred, num_classes)
        return onehot_t.T @ onehot_p                  # (C, C) counts

    return step


def make_cm_step(model) -> Callable:
    """One batch of the ``cal_mean_feature`` bootstrap pass
    (reference ``train.py:868-897``): running class-conditional mean of
    softmax outputs.  Returns (sum (C, C), count (C,)) contributions."""

    @jax.jit
    def step(variables, batch):
        logits = _logits_of(model.apply(variables, batch, training=False))
        probs = jax.nn.softmax(logits, axis=-1)
        C = probs.shape[-1]
        flat = probs.reshape(-1, C)
        labels = batch["y"].reshape(-1)
        onehot = jax.nn.one_hot(labels, C)                     # (M, C)
        sums = onehot.T @ flat                                  # (C, C)
        counts = jnp.sum(onehot, axis=0)
        return sums, counts

    return step
