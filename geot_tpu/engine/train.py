"""Training driver — the rebuild of ``examples/segmentation/train.py``.

Usage (same CLI shape as the reference, ``README.md:34``):

    python -m geot_tpu.engine.train --cfg cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml [k=v ...]

Structure: ``main(cfg)`` builds loaders/models/optimizers, then per epoch runs
the phase-appropriate jitted step over the epoch's batches and periodically
validates/checkpoints.  All device state lives in one donated pytree.
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from ..core.config import EasyConfig
from ..core.logger import generate_exp_directory, resume_exp_directory, setup_logger_dist
from ..core.metrics import AverageMeter
from ..core.random import set_random_seed
from ..data import (build_dataloader_from_cfg, build_semi_dataloader_from_cfg)
from ..models import build_model_from_cfg
from ..optim import build_optimizer_from_cfg, build_scheduler_from_cfg
from .checkpoint import save_checkpoint
from .eval import validate
from .state import SemiTrainState, TrainState
from .steps import make_cm_step, make_eval_step, make_semi_step, make_supervised_step
from .writer import SummaryWriter


def _model_batch(batch, put):
    return put({k: batch[k] for k in ("pos", "x", "cls", "y", "class_weights")})


def _semi_batch(batch, put):
    # "cur" (per-point curvature, consumed by Poly1FocalLoss_U_Cur's gating)
    # is optional: only datasets that carry curvature emit it
    keys = ("pos_w", "x_w", "cls_w", "pos_s", "x_s", "cls_s", "raw_pos", "y")
    return put({k: batch[k] for k in keys + (("cur",) if "cur" in batch else ())})


def device_prefetch(host_iter, put_fn, depth: int | None = None):
    """Yield ``put_fn(item)`` for each item, with uploads running ``depth``
    items ahead in a background thread (``GEOT_PREFETCH_DEPTH`` overrides;
    0 = fully synchronous, for A/B timing).

    Keeps host-side batch staging (loader collate + ``device_put`` issue)
    off the dispatch thread so the device queue never drains while the host
    prepares the next upload.  The reference gets the same overlap from
    torch DataLoader worker processes + ``.cuda(non_blocking=True)``
    (``train.py:443,466``).  Measured A/B on the flagship exact-mode semi
    config (12 epochs, TPU, r3): depth=2 and depth=0 both run 3.6-3.9
    s/epoch — ``device_put`` through the axon tunnel is already async, so
    today this is a guard against host-side staging cost (bigger collates,
    multi-host sharding), not a measured win."""
    import concurrent.futures as _fut
    from collections import deque

    if depth is None:
        depth = int(os.environ.get("GEOT_PREFETCH_DEPTH", "2"))
    if depth <= 0:
        for item in host_iter:
            yield put_fn(item)
        return
    pool = _fut.ThreadPoolExecutor(1)
    try:
        q = deque()
        for item in host_iter:
            q.append(pool.submit(put_fn, item))
            if len(q) > depth:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()
    finally:
        pool.shutdown(wait=False)


def make_device_put(mesh, host_local: bool = False):
    """Host->device batch placement. With a mesh, numpy batches are laid out
    dp-sharded directly (no device-0 staging hop); without one, plain
    ``jnp.asarray``. The dp-sharded layout replaces the reference's
    ``DistributedSampler`` + DDP input scatter (``train.py:159-166``).

    ``host_local=True`` (multi-process runs): each process holds only its
    per-host loader shard of the global batch; the global array is assembled
    across processes (see ``parallel.shard_batch``)."""
    import jax
    import jax.numpy as jnp

    if mesh is None:
        return lambda d: jax.tree_util.tree_map(jnp.asarray, d)
    from ..parallel import shard_batch
    return lambda d: shard_batch(d, mesh, host_local=host_local)


def place_variables(variables, mesh):
    """Put restored (host-numpy) model variables on device ONCE — tp-sharded
    under a mesh, plain upload otherwise — so downstream eval_step calls
    reuse the same buffers instead of re-uploading per batch.  The one
    placement rule for the eval-only and best-ckpt-test paths."""
    import jax
    import jax.numpy as jnp

    if mesh is not None:
        from ..parallel import shard_state

        return shard_state(variables, mesh)
    return jax.tree_util.tree_map(jnp.asarray, variables)


def cal_mean_feature(cm_step, variables, loader, num_classes, put):
    """Bootstrap pass for the class-mean softmax matrix
    (reference ``train.py:868-897``; the reference's ``logits[target]`` row
    indexing bug is fixed to the intended class-conditional mean)."""
    import jax.numpy as jnp

    total = np.zeros((num_classes, num_classes), dtype=np.float64)
    counts = np.zeros((num_classes,), dtype=np.float64)
    for batch in loader:
        sums, cnts = cm_step(variables, _model_batch(batch, put))
        total += np.asarray(sums, dtype=np.float64)
        counts += np.asarray(cnts, dtype=np.float64)
    cm = total / np.maximum(counts[:, None], 1.0)
    return jnp.asarray(cm.astype(np.float32))


def cal_confusion(confusion_step, variables, loader, num_classes, put):
    """Row-normalised hard-label confusion bootstrap — the alternative cm
    initialiser (reference ``cal_confusion_matrix``, ``train.py:841-866``;
    upstream's ``cm / (np.sum(cm, 1) + 0.001)`` broadcasts row-sums over
    columns — repaired to the intended per-row normalisation).  Selected with
    ``cm_bootstrap: confusion``."""
    import jax.numpy as jnp

    total = np.zeros((num_classes, num_classes), dtype=np.float64)
    for batch in loader:
        total += np.asarray(confusion_step(variables, _model_batch(batch, put)),
                            dtype=np.float64)
    cm = total / (total.sum(1, keepdims=True) + 0.001)
    return jnp.asarray(cm.astype(np.float32))


def main(cfg: EasyConfig) -> dict:
    import jax
    import jax.numpy as jnp

    # Multi-host: the reference spawns one DDP process per GPU
    # (``train.py:957-963`` mp.spawn + init_process_group); on TPU pods the
    # analog is one process per host joined via jax.distributed.
    jd = cfg.get("jax_distributed")
    if jd and not jax.distributed.is_initialized():
        # True: auto-detect (TPU pods); dict: explicit coordinator —
        # {coordinator_address, num_processes, process_id} for CPU/GPU
        # clusters and the 2-process integration test.  NOTE initialize()
        # must precede ANY backend use, including imports that touch
        # jax.devices — launchers that import more than this module first
        # should initialize before importing (see tests/dist_worker.py).
        jax.distributed.initialize(**(dict(jd) if isinstance(jd, dict)
                                      else {}))
    multihost = jax.process_count() > 1

    setup_logger_dist(cfg.get("log_path"), jax.process_index(), name="geot_tpu")
    logger = logging.getLogger()
    set_random_seed(cfg.get("seed", 0))
    # scalar/TB files are single-writer (reference rank-0 SummaryWriter,
    # ``train.py:122-124``): concurrent appends from every host would race
    writer = (SummaryWriter(cfg.get("run_dir"))
              if cfg.get("run_dir") and jax.process_index() == 0 else None)
    # reference launches wandb with git state + cfg capture (``train.py:122``)
    from .writer import Wandb
    Wandb.launch(cfg, bool(cfg.get("wandb", {}).get("use_wandb", False)))

    num_classes = int(cfg.num_classes)
    semi_mode = "dataset_u" in cfg and "criterion_u_args" in cfg

    # ---- device mesh -----------------------------------------------------
    # DDP + SyncBN (reference ``train.py:159-166``) becomes: one dp(xtp) mesh,
    # state + batches GSPMD-sharded; gradient all-reduce and global batch-norm
    # statistics fall out of the sharded jit with no communication code.
    from ..parallel import auto_mesh, shard_state
    mesh = auto_mesh(cfg, logger)
    put = make_device_put(mesh, host_local=multihost)

    # ---- data ----------------------------------------------------------
    # Multi-host: TRAIN loaders are per-host sharded (each host loads
    # global_batch/process_count samples of every global batch — reference
    # ``DistributedSampler``, ``build.py:107``); val/test loaders stay
    # unsharded so every host scores the full split identically (no
    # cross-host metric reduction needed).
    val_loader = build_dataloader_from_cfg(
        cfg.get("batch_size_val", 2), cfg.dataset_l, cfg.get("dataloader"),
        cfg.get("datatransforms"), split="val", seed=cfg.get("seed", 0))
    test_loader = build_dataloader_from_cfg(
        cfg.get("batch_size_test", 2), cfg.dataset_l, cfg.get("dataloader"),
        cfg.get("datatransforms"), split="test", seed=cfg.get("seed", 0))
    train_loader_l = build_dataloader_from_cfg(
        cfg.get("batch_size_l", cfg.get("batch_size", 2)), cfg.dataset_l,
        cfg.get("dataloader"), cfg.get("datatransforms"), split="train",
        seed=cfg.get("seed", 0), distributed=multihost)
    train_loader_u = None
    if semi_mode:
        train_loader_u = build_semi_dataloader_from_cfg(
            cfg.get("batch_size_u", 2), cfg.dataset_u, cfg.get("dataloader"),
            cfg.get("datatransforms"), split="train", seed=cfg.get("seed", 0),
            distributed=multihost)
    logger.info(f"datasets: train_l={len(train_loader_l.dataset)} "
                f"val={len(val_loader.dataset)} test={len(test_loader.dataset)}"
                + (f" train_u={len(train_loader_u.dataset)}" if train_loader_u else ""))

    # ---- models --------------------------------------------------------
    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    sample = next(iter(train_loader_l))
    init_batch = _model_batch(sample, put)
    init = jax.jit(model.init, static_argnames=())
    variables = init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                     init_batch)
    from ..core.metrics import cal_model_parm_nums

    nparams = cal_model_parm_nums(variables["params"])
    logger.info(f"model params: {nparams / 1e6:.3f} M")

    # native TAP-pretrain import (the reference's WholePartSeg.load_pretrain
    # remap, ``base_seg.py:97-123``): graft a geot_tpu.engine.pretrain
    # checkpoint's encoder trunk into the segmentor before training
    pep = cfg.get("pretrain_encoder_path")
    if pep:
        if not os.path.isdir(str(pep)):
            # a typo'd path silently training from random encoder init is the
            # worst failure mode of a transfer run — refuse instead
            raise FileNotFoundError(
                f"pretrain_encoder_path={pep} is not a checkpoint directory")
        from .checkpoint import load_pretrain_encoder
        variables, pep_skipped = load_pretrain_encoder(variables, pep)
        logger.info(f"grafted pretrain encoder from {pep}"
                    + (f" ({len(pep_skipped)} anomalies: {pep_skipped[:3]})"
                       if pep_skipped else ""))

    tx = build_optimizer_from_cfg(None, lr=cfg.lr,
                                  every_k=int(cfg.get("step_per_update", 1) or 1),
                                  **cfg.optimizer)
    schedule = build_scheduler_from_cfg(cfg)
    eval_step = make_eval_step(model)

    pretrained = cfg.get("pretrained_path")
    mode = str(cfg.get("mode") or "train")
    eval_only = mode in ("val", "test", "eval", "testing", "evaluation")
    # torch-pretrain import applies to FILES (.pth); orbax checkpoint DIRS
    # go through load_variables (eval/finetune modes) or the mode=resume
    # branch below (full state restore) — don't mis-try them here
    loaded_vars = None
    if pretrained and os.path.isfile(str(pretrained)):
        from .checkpoint import convert_torch_seg_t, load_torch_pth
        try:
            sd = load_torch_pth(pretrained)
            p, s = convert_torch_seg_t(sd, depth=cfg.model.segmentor_args.depth)
            loaded_vars = {"params": p, "batch_stats": s}
            logger.info(f"loaded torch pretrain from {pretrained}")
        except Exception as e:  # noqa: BLE001
            logger.warning(f"pretrain load failed ({e}); training from scratch")
    elif (pretrained and os.path.isdir(str(pretrained))
          and (eval_only or mode in ("finetune", "finetune_encoder"))):
        from .checkpoint import load_variables
        # use_ema: "auto" (default) loads whichever tree the source run's
        # best-val selection recorded as the winner (extra["tree"]) for
        # eval-only modes, the raw weights for finetune; true/false force it
        use_ema = cfg.get("use_ema", "auto")
        prefer_ema = (("auto" if eval_only else False)
                      if use_ema == "auto" else bool(use_ema))
        loaded_vars = load_variables(pretrained, prefer_ema=prefer_ema)
        logger.info(f"loaded checkpoint variables from {pretrained}"
                    + ("" if prefer_ema is False else
                       " (EMA weights per the run's own selection)"))
    if loaded_vars is not None:
        # reference load semantics: eval / plain finetune load the whole
        # model, finetune_encoder loads the encoder submodule only
        # (``examples/segmentation/train.py:191-203``); shape mismatches are
        # skipped-and-reported like ``ckpt_util.py:225-258``
        from .checkpoint import graft_variables
        subtree = "encoder" if mode == "finetune_encoder" else None
        variables, skipped = graft_variables(variables, loaded_vars,
                                             only_subtree=subtree)
        if skipped:
            # any weight leaf that kept random init — absent from the ckpt,
            # wrong shape, or a subtree/leaf clash — makes eval metrics
            # garbage; '(unexpected)' ckpt-side extras are benign
            bad = [s for s in skipped if not s.endswith("(unexpected)")]
            if bad and eval_only:
                raise ValueError(
                    f"checkpoint {pretrained} does not cover the model: "
                    f"{len(bad)} leaves kept random init "
                    f"({bad[:5]}{'...' if len(bad) > 5 else ''})")
            logger.warning(f"checkpoint graft skipped {len(skipped)} entries: "
                           f"{skipped[:5]}{'...' if len(skipped) > 5 else ''}")
    elif pretrained and mode not in ("resume",):
        # nothing was loaded: the path is missing/invalid, or mode=train does
        # not consume pretrained_path (reference loads only under
        # finetune/val/test/resume, ``train.py:181-203``).  Eval-only on
        # random init reports garbage — refuse; otherwise warn loudly.
        msg = (f"pretrained_path={pretrained} was NOT loaded "
               f"(exists={os.path.exists(str(pretrained))}, mode={mode}; "
               f"train mode ignores pretrained_path — use mode=finetune/"
               f"finetune_encoder/resume or pretrain_encoder_path)")
        if eval_only:
            raise FileNotFoundError(msg)
        logger.warning(msg)
    elif eval_only and not pretrained:
        raise ValueError(f"mode={mode} (eval-only) requires pretrained_path")

    if eval_only:
        # reference eval-only modes (``train.py:191-197``): load weights,
        # validate the requested split (with optional TTA voting), and
        # return — no training state is built.  mode=test evaluates the
        # TEST split; val/eval the val split.
        eval_split = "test" if mode in ("test", "testing") else "val"
        eval_loader = test_loader if eval_split == "test" else val_loader
        test_vars = place_variables(variables, mesh)
        vote_t = None
        if int(cfg.get("num_votes", 0) or 0) > 0:
            from ..data.transforms import build_transforms_from_cfg
            vote_t = build_transforms_from_cfg("vote", cfg.get("datatransforms"))
        res = validate(eval_step, test_vars, eval_loader, cfg, logger,
                       num_votes=int(cfg.get("num_votes", 0) or 0),
                       data_transform=vote_t, mesh=mesh, tag=eval_split)
        if writer:
            for k, v in res.items():
                writer.add_scalar(f"{mode}_{k}", v, 0)
            writer.close()
        return {eval_split: res}

    if semi_mode:
        model_t = build_model_from_cfg(cfg.get("model_t", cfg.model))
        t_predictor = build_model_from_cfg(cfg.t_predictor)
        probs0 = jax.nn.softmax(jnp.zeros((1, 8, num_classes)), -1)
        t_vars = t_predictor.init(jax.random.fold_in(rng, 2), probs0,
                                  jnp.eye(num_classes))
        t_tx = build_optimizer_from_cfg(None, lr=cfg.lr, **cfg.optimizer)
        state = SemiTrainState.create(
            variables, tx, t_vars, t_tx, num_classes,
            jax.random.fold_in(rng, 3), teacher_variables=variables,
            contrast_dim=int(cfg.model.segmentor_args.get("trans_dim", 384)),
            ema=bool(cfg.get("ema_eval")))
        semi_step = make_semi_step(model, model_t, t_predictor, tx, t_tx, cfg)
        # NOTE: the cm bootstrap runs AFTER the resume branch below — a
        # params-only resume must compute cm from the RESTORED weights, not
        # the fresh random init (round-3 review finding)
    else:
        state = TrainState.create(variables, tx, ema=bool(cfg.get("ema_eval")))
        semi_step = None
    sup_step = make_supervised_step(model, tx, cfg)

    supervised_epochs = int(cfg.get("supervised_epochs", 0))
    switch_ep = int(cfg.get("switch_ep", 0))
    best = {"miou": 0.0, "dsc": 0.0, "acc": 0.0, "epoch": 0}
    results = {}
    start_epoch = int(cfg.get("start_epoch", 1))

    # resume: restore the full state pytree + epoch counter
    # (reference ``resume_checkpoint``, ``openpoints/utils/ckpt_util.py:111``)
    resume_missing: list = []
    if mode == "resume":
        if not (pretrained and os.path.isdir(str(pretrained))):
            # silently restarting from scratch would overwrite the run's
            # *_ckpt_best/latest with fresh-init training — refuse
            raise FileNotFoundError(
                f"mode=resume requires pretrained_path pointing at a "
                f"checkpoint directory; got {pretrained!r}")
        from .checkpoint import load_checkpoint as _load_state
        state, ckpt_epoch, extra = _load_state(pretrained, state,
                                               missing_fields=resume_missing)
        start_epoch = int(ckpt_epoch) + 1
        best.update(extra or {})
        logger.info(f"resumed from {pretrained} at epoch {ckpt_epoch}")
        if cfg.get("ema_eval") and (
                "ema_params" in resume_missing or not state.ema_params):
            # checkpoint predates EMA eval (or was saved with it off): seed
            # the shadow from the RESTORED weights, not the fresh init the
            # template carried into load_checkpoint
            state = state.replace(ema_params=jax.tree_util.tree_map(
                jnp.copy, state.params))
            logger.info("ema_eval: seeded EMA shadow from restored weights")

    # cm bootstrap (reference ``cal_mean_feature``, ``train.py:276,868``):
    # from the CURRENT weights — fresh init for mode=train (reference
    # semantics), restored weights for a params-only resume.  A full-state
    # resume keeps the restored cm (resume trajectory == uninterrupted).
    if semi_mode and (mode != "resume" or "cm" in resume_missing):
        if cfg.get("cm_bootstrap", "mean_feature") == "confusion":
            from .steps import make_confusion_step
            state = state.replace(cm=cal_confusion(
                make_confusion_step(model, num_classes), state.variables,
                train_loader_l, num_classes, put))
        else:
            cm_step = make_cm_step(model)
            state = state.replace(cm=cal_mean_feature(
                cm_step, state.variables, train_loader_l, num_classes, put))

    if mesh is not None:
        # place params + optimizer moments by the tp rules, replicate the
        # rest; gradients/batch-stat reductions become global under jit.
        # fsdp: true additionally dp-shards every big param + its moments
        # (ZeRO-3 semantics: XLA all-gathers at use, reduce-scatters grads) —
        # a capability beyond the reference's DDP-only stack.
        state = shard_state(state, mesh, fsdp=bool(cfg.get("fsdp", False)))

    from .profiler import StepTimer
    # rank-0-only like the scalar writer: concurrent appends from every
    # host to the shared run dir would interleave
    timer = StepTimer(os.path.join(cfg.run_dir, "step_times.jsonl")
                      if cfg.get("run_dir") and jax.process_index() == 0
                      else None)

    # epoch-scalar tags, named exactly like the reference's writer calls
    # (``train.py:307-330``) -> key in the jitted step's metrics dict
    ref_tags = {"train_loss": "loss", "train_loss_l": "sup_loss",
                "train_loss_u": "unsup_loss", "th_percentage": "over_th",
                "train_over_th_acc": "pseudo_acc", "teacher_acc": "teacher_acc",
                "student_acc": "student_acc", "over_th_wobg": "over_th_wobg",
                "over_acc_wobg": "over_acc_wobg",
                "manifold_loss_feat": "feat_loss",
                "insT_identity_loss": "identity_loss",
                "insT_threed_loss": "threed_loss",
                # beyond the reference's writer set: the contrastive term is
                # invisible in the reference logs (instantiated but never
                # called, reference train.py:267); all-flags evidence runs
                # need it surfaced
                "contrast_loss": "contrast_loss"}
    cls_tags = {"train_over_th_acc_class": "pseudo_acc_classwise",
                "train_over_th_num_class": "over_th_classwise",
                "train_over_th_recall_class": "over_th_recall_classwise"}

    host_step = int(jax.device_get(state.step))  # one sync; counts on host
    # reference train.py:694 throttles its in-epoch progress line by
    # cfg.print_freq; here the line is host-side only (steps *dispatched*:
    # fetching live metrics would serialise the async pipeline)
    print_freq = int(cfg.get("print_freq", 0) or 0)

    # preemption safety (beyond the reference, whose crash recovery is manual
    # resume only): SIGTERM/SIGINT finish the current epoch, checkpoint, and
    # exit cleanly — preemptible TPU pods send SIGTERM ahead of reclaim
    import signal

    preempted = {"sig": None}
    orig_handlers = {}

    def _restore_handlers():
        while orig_handlers:
            s, h = orig_handlers.popitem()
            signal.signal(s, h)

    def _on_preempt(signum, frame):
        preempted["sig"] = signum
        # a SECOND signal gets the default behaviour (force-exit): a hung
        # device call would otherwise make the process uninterruptible
        _restore_handlers()
        logger.warning(f"signal {signum}: will checkpoint and stop after "
                       f"the current epoch (repeat to force-exit)")

    try:
        for s in (signal.SIGTERM, signal.SIGINT):
            orig_handlers[s] = signal.signal(s, _on_preempt)
    except ValueError:
        pass  # not the main thread (in-process test harnesses)

    # in-run device profiling: ``profile_epoch: N`` captures a perfetto/TB
    # trace of epoch N into <run_dir>/trace (observability beyond the
    # reference, which has only tqdm bars — SURVEY §5)
    profile_epoch = int(cfg.get("profile_epoch", 0) or 0)

    try:
        for epoch in range(start_epoch, int(cfg.epochs) + 1):
            profiling = profile_epoch == epoch
            if profiling:
                trace_dir = os.path.join(cfg.get("run_dir") or ".", "trace")
                os.makedirs(trace_dir, exist_ok=True)
                jax.profiler.start_trace(trace_dir,
                                         create_perfetto_trace=True)
                logger.info(f"profiling epoch {epoch} -> {trace_dir}")
            train_loader_l.set_epoch(epoch)
            lr = jnp.asarray(schedule(epoch), dtype=jnp.float32)
            # metric accumulation stays ON DEVICE for the whole epoch: any
            # per-step float()/device_get is a host sync that serialises the
            # dispatch pipeline (measured: 45 ms/step device but 5.5 s/epoch
            # wall with per-step fetches — the tunnel round-trip dominates)
            ep_dev, ep_n = None, 0
            t0 = time.time()

            def _accum(metrics):
                nonlocal ep_dev, ep_n
                ep_dev = metrics if ep_dev is None else jax.tree_util.tree_map(
                    jnp.add, ep_dev, metrics)
                ep_n += 1

            if semi_mode and epoch > supervised_epochs:
                train_loader_u.set_epoch(epoch)
                use_teacher = epoch <= switch_ep

                def _pairs():
                    u_iter = iter(train_loader_u)
                    for batch_l in train_loader_l:
                        try:
                            batch_u = next(u_iter)
                        except StopIteration:
                            u_iter = iter(train_loader_u)
                            try:
                                batch_u = next(u_iter)
                            except StopIteration:
                                # PEP 479 would surface this as an opaque
                                # 'generator raised StopIteration'
                                raise RuntimeError(
                                    "unlabeled train loader is empty — check "
                                    "dataset_u config") from None
                        yield batch_l, batch_u

                for dev_l, dev_u in device_prefetch(
                        _pairs(), lambda p: (_model_batch(p[0], put),
                                             _semi_batch(p[1], put))):
                    state, metrics = semi_step(state, dev_l, dev_u, lr,
                                               use_teacher)
                    if os.environ.get("GEOT_LOG_STEP_LOSS"):
                        # debug knob: full-precision per-step losses (forces
                        # a per-step sync — never enable in production runs)
                        logger.info(
                            f"steploss {epoch}/{ep_n} "
                            f"{float(metrics['loss']):.9f} "
                            f"sup {float(metrics['sup_loss']):.9f} "
                            f"unsup {float(metrics['unsup_loss']):.9f}")
                    _accum(metrics)
                    host_step += 1
                    timer.tick(host_step, epoch=epoch)
                    if print_freq and ep_n % print_freq == 0:
                        logger.info(f"epoch {epoch} step {ep_n} dispatched "
                                    f"({time.time() - t0:.1f}s)")
            else:
                # supervised phase trains the plain TrainState view of the state
                sup_state = TrainState(params=state.params,
                                       batch_stats=state.batch_stats,
                                       opt_state=state.opt_state, step=state.step) \
                    if semi_mode else state
                for dev_l in device_prefetch(iter(train_loader_l),
                                             lambda b: _model_batch(b, put)):
                    sup_state, metrics = sup_step(sup_state, dev_l, lr)
                    _accum(metrics)
                    host_step += 1
                    timer.tick(host_step, epoch=epoch)
                    if print_freq and ep_n % print_freq == 0:
                        logger.info(f"epoch {epoch} step {ep_n} dispatched "
                                    f"({time.time() - t0:.1f}s)")
                if semi_mode:
                    state = state.replace(params=sup_state.params,
                                          batch_stats=sup_state.batch_stats,
                                          opt_state=sup_state.opt_state,
                                          step=sup_state.step)
                else:
                    state = sup_state

            # re-sync the host step counter from device state once per epoch so
            # step_times.jsonl ids can never drift from checkpointed state.step
            # (ADVICE r2); piggybacks on the one-fetch-per-epoch budget
            host_step = int(jax.device_get(state.step))

            # single D2H sync per epoch for all scalar + per-class metrics
            ep_mean = {k: np.asarray(v, dtype=np.float64) / max(ep_n, 1)
                       for k, v in jax.device_get(ep_dev).items()} if ep_n else {}
            if profiling:
                # the device_get above is the epoch's barrier, so the trace
                # has the complete device timeline (an exception mid-epoch
                # leaves the trace open — the process is terminating anyway)
                jax.profiler.stop_trace()
            meters = {k: AverageMeter() for k in ("loss", "sup_loss", "unsup_loss")}
            for k in meters:
                meters[k].update(float(ep_mean.get(k, float("nan"))))

            logger.info(f"epoch {epoch}/{cfg.epochs} lr={float(lr):.6f} "
                        f"loss={meters['loss'].avg:.5f} "
                        f"sup={meters['sup_loss'].avg:.5f} "
                        f"unsup={meters['unsup_loss'].avg:.5f} "
                        f"({time.time() - t0:.1f}s)")
            if float(ep_mean.get("skipped", 0.0)) > 0:
                n_skip = round(float(ep_mean["skipped"]) * ep_n)
                logger.warning(f"epoch {epoch}: {n_skip}/{ep_n} steps skipped "
                               f"(non-finite loss/gradients)")
                if writer:
                    writer.add_scalar("skipped_steps", n_skip, epoch)
            if writer:
                writer.add_scalar("lr", float(lr), epoch)
                for tag, key in ref_tags.items():
                    if key in ep_mean:
                        writer.add_scalar(tag, float(ep_mean[key]), epoch)
                for tag, key in cls_tags.items():
                    if key in ep_mean:
                        for ji, v in enumerate(np.ravel(ep_mean[key])):
                            writer.add_scalar(f"{tag}_{ji}", float(v), epoch)

            # freq 0/None disables periodic eval (final epoch always runs)
            val_freq = int(cfg.get("val_freq", 250) or 0)
            if (val_freq and epoch % val_freq == 0) or epoch == int(cfg.epochs):
                ema_on = bool(cfg.get("ema_eval")) and bool(state.ema_params)
                res = validate(eval_step, state.eval_variables, val_loader,
                               cfg, logger, mesh=mesh)
                results["val"] = res
                # selection candidate: the better of the EMA and raw trees —
                # a mistuned EMA decay must degrade gracefully (best-ckpt
                # selection and the plateau scheduler fall back to the raw
                # weights), never silently wreck the run's reported best
                sel, sel_tree = res, ("ema" if ema_on else "raw")
                if ema_on:
                    # also score the RAW weights so the EMA benefit (or harm)
                    # is visible inside one run — eval tensors are device-
                    # cached, so this is one extra device-bound pass
                    res_raw = validate(eval_step, state.variables, val_loader,
                                       cfg, logger, mesh=mesh, tag="val_raw")
                    results["val_raw"] = res_raw
                    if writer:
                        for k, v in res_raw.items():
                            writer.add_scalar(f"val_raw_{k}", v, epoch)
                    if res_raw["whole_miou"] > sel["whole_miou"]:
                        sel, sel_tree = res_raw, "raw"
                if hasattr(schedule, "note_metric"):  # plateau scheduler feedback
                    schedule.note_metric(sel["whole_miou"])
                is_best = sel["whole_miou"] >= best["miou"] or np.isnan(best["miou"])
                if is_best and not np.isnan(sel["whole_miou"]):
                    # ema_selected is numeric (1.0/0.0): orbax's standard
                    # handler rejects string leaves in the saved extra dict
                    best.update(miou=sel["whole_miou"], dsc=sel["whole_dsc"],
                                acc=sel["whole_acc"], epoch=epoch,
                                ema_selected=float(sel_tree == "ema"))
                if writer:
                    for k, v in res.items():
                        writer.add_scalar(f"val_{k}", v, epoch)
                    # reference tag names (``train.py:308-313``)
                    writer.add_scalar("val_miou", res["whole_miou"], epoch)
                    writer.add_scalar("val_dsc", res["whole_dsc"], epoch)
                    writer.add_scalar("val_acc", res["whole_acc"], epoch)
                    writer.add_scalar("best_val_miou", best["miou"], epoch)
                    writer.add_scalar("best_val_dsc", best["dsc"], epoch)
                    writer.add_scalar("best_val_acc", best["acc"], epoch)
                if cfg.get("ckpt_dir"):
                    save_checkpoint(cfg, state, epoch,
                                    additional_dict=best, is_best=is_best,
                                    save_freq=cfg.get("save_freq"))

            test_freq = int(cfg.get("test_freq", 250) or 0)
            if (test_freq and epoch % test_freq == 0) or epoch == int(cfg.epochs):
                # reference reloads the BEST-val checkpoint before every test
                # evaluation (``train.py:350-352``) so reported test metrics come
                # from the best state, not the current one.  Unlike the reference
                # (whose load persists into subsequent training) the training
                # state is left untouched.
                test_vars = state.eval_variables
                if cfg.get("ckpt_dir"):
                    from .checkpoint import _ckpt_path, load_variables
                    best_path = _ckpt_path(cfg["ckpt_dir"],
                                           cfg.get("run_name", "run"), "best")
                    if os.path.exists(best_path):
                        # load the tree the best-val selection actually won
                        # with (best["ema_selected"]; 0.0 when EMA was
                        # maintained but the raw weights validated better)
                        test_vars = place_variables(
                            load_variables(best_path,
                                           prefer_ema=bool(
                                               best.get("ema_selected", 0))),
                            mesh)
                        logger.info(f"test eval on best ckpt (epoch {best['epoch']})")
                res = validate(eval_step, test_vars, test_loader, cfg, logger,
                               mesh=mesh, tag="test")
                results["test"] = res
                if writer:
                    for k, v in res.items():
                        writer.add_scalar(f"test_{k}", v, epoch)
                if int(cfg.get("num_votes", 0) or 0) > 0:
                    from ..data.transforms import build_transforms_from_cfg
                    vote_t = build_transforms_from_cfg("vote", cfg.get("datatransforms"))
                    res_v = validate(eval_step, test_vars, test_loader, cfg,
                                     logger, num_votes=int(cfg["num_votes"]),
                                     data_transform=vote_t, mesh=mesh,
                                     tag="test_voting")
                    results["test_voting"] = res_v
                    if writer:
                        for k, v in res_v.items():
                            writer.add_scalar(f"test_{k}_voting", v, epoch)

            if preempted["sig"] is not None:
                if cfg.get("ckpt_dir"):
                    save_checkpoint(cfg, state, epoch, additional_dict=best,
                                    is_best=False)
                logger.warning(f"preempted (signal {preempted['sig']}) at epoch "
                               f"{epoch}: checkpoint saved — continue with "
                               f"mode=resume")
                results["preempted_at"] = epoch
                break

    finally:
        # exceptions must not leak the preemption handler into the
        # caller's process (in-process harnesses)
        _restore_handlers()
    results["best"] = best
    if writer:
        writer.close()
    return results


def _draw_seed() -> int:
    """Draw a run seed when the cfg pins none.  Multi-process: each rank
    drew a different value — a per-rank seed silently desyncs loader
    shuffle permutations (block-shard assembly would mix rows of different
    permutations) and model init, so rank 0's draw is broadcast to all
    (ADVICE r4; 2-process test in ``tests/test_multiprocess_dist.py``)."""
    import jax

    seed = int(np.random.randint(1, 10000))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        seed = int(multihost_utils.broadcast_one_to_all(np.int32(seed)))
    return seed


def parse_and_run(argv=None):
    parser = argparse.ArgumentParser("GeoT-TPU segmentation training")
    parser.add_argument("--cfg", type=str, required=True)
    args, opts = parser.parse_known_args(argv)
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update(opts)
    if cfg.get("seed") is None:
        cfg.seed = _draw_seed()

    cfg.task_name = args.cfg.split(".")[-2].split("/")[-2]
    cfg.cfg_basename = args.cfg.split(".")[-2].split("/")[-1]
    tags = [cfg.task_name, cfg.get("mode", "train"), cfg.cfg_basename,
            f"seed{cfg.seed}"]
    cfg.root_dir = os.path.join(cfg.get("root_dir", "./log"), cfg.task_name)
    # same eval-only spelling set as main(): every eval mode reuses the
    # checkpoint's run dir instead of generating a fresh experiment dir.
    # An explicit run_dir override wins outright — the multi-process
    # launcher (engine/launch.py) pre-creates ONE run dir that every rank
    # must share (orbax's coordinated save requires identical paths).
    if cfg.get("run_dir"):
        cfg.run_name = cfg.get("run_name") or "-".join(tags)
        cfg.ckpt_dir = cfg.get("ckpt_dir") or os.path.join(
            cfg.run_dir, "checkpoint")
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
    elif cfg.get("mode") in ("resume", "test", "val", "eval", "testing",
                             "evaluation"):
        resume_exp_directory(cfg, pretrained_path=cfg.get("pretrained_path"))
    else:
        generate_exp_directory(cfg, tags)
    import yaml

    # eval-only invocations reuse the training run dir — they must not
    # clobber its cfg.yaml (the run's provenance, possibly with different
    # model flags than this eval's overrides); write cfg_<mode>.yaml instead
    cfg_name = "cfg.yaml"
    if (cfg.get("mode") in ("test", "val", "eval", "testing", "evaluation")
            and os.path.exists(os.path.join(cfg.run_dir, "cfg.yaml"))):
        cfg_name = f"cfg_{cfg['mode']}.yaml"
    with open(os.path.join(cfg.run_dir, cfg_name), "w") as f:
        yaml.dump(cfg.dict(), f, indent=2)
    if cfg.get("model") and "generator_args" in cfg.model:
        # generation-stack configs (TAP pretraining) run the pretrain driver
        from .pretrain import main as pretrain_main
        return pretrain_main(cfg)
    if cfg.get("task") == "partseg":
        # heritage ShapeNetPart instance-mIoU pipeline (``engine/partseg.py``)
        from .partseg import main as partseg_main
        return partseg_main(cfg)
    if cfg.get("task") == "cls":
        # heritage classification pipeline (``engine/cls.py``)
        from .cls import main as cls_main
        return cls_main(cfg)
    return main(cfg)


if __name__ == "__main__":
    parse_and_run()
