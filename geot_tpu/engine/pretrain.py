"""TAP-style multi-view generative pretraining driver (stage 1 of the GeoT
method).

The reference repo ships the pretraining datasets
(``openpoints/dataset/tooth_pretrain/tooth_dataset.py:44,171``) and the
generation stack (``openpoints/models/generation/*``) but no runnable driver
— its pretraining lives in the separate TAP codebase (the flagship config
points at a TAP checkpoint, ``cfgs/tooth_semi/transformer_finetune_fixmatch_
ntm.yaml:5``).  This driver completes the pipeline natively: it trains a
``ViewGenBase`` (point encoder -> cross-attention view generator -> conv
decoder, foreground-weighted MSE) and saves checkpoints whose encoder trunk
grafts directly into the segmentation flagship (same flax module names —
``load_pretrain_encoder``), replacing the reference's
``WholePartSeg.load_pretrain`` key remap (``base_seg.py:97-123``).

Usage:
    python -m geot_tpu.engine.pretrain --cfg cfgs/tooth_pretrain/viewgen.yaml
(or ``geot-train --cfg ...`` — the train CLI dispatches here when the model
config has ``generator_args``).
"""
from __future__ import annotations

import functools
import logging
import os
import time

import numpy as np

from ..core.config import EasyConfig
from ..core.logger import setup_logger_dist
from ..data import build_dataloader_from_cfg
from ..models import build_model_from_cfg
from ..optim import build_optimizer_from_cfg, build_scheduler_from_cfg
from .checkpoint import save_checkpoint
from .state import TrainState
from .train import device_prefetch, make_device_put
from .writer import SummaryWriter

BATCH_KEYS = ("pos", "x", "views", "imgs", "weight")


def _pretrain_batch(batch, put):
    return put({k: batch[k] for k in BATCH_KEYS if k in batch})


def make_pretrain_step(model, tx, cfg):
    """One jitted generative-pretraining step over donated TrainState: the
    generation models compute their own reconstruction loss
    (``ViewGenBase.__call__ -> (loss, recon)``, reference
    ``view_gen_base.py:8-52``)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..optim.factory import set_learning_rate

    clip = cfg.get("grad_norm_clip")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, lr):
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.get("seed", 0)),
                                 state.step)

        def loss_fn(params):
            (loss, _recon), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, training=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    return step


def make_pretrain_eval_step(model):
    import jax

    @jax.jit
    def step(variables, batch):
        loss, _ = model.apply(variables, batch, training=False)
        return loss

    return step


def validate_pretrain(eval_step, variables, loader, put, logger=None):
    """Mean reconstruction loss over the val split (the pretraining quality
    signal; there are no labels at this stage)."""
    import jax

    losses = [eval_step(variables, _pretrain_batch(b, put)) for b in loader]
    val_loss = float(np.mean(jax.device_get(losses))) if losses else float("nan")
    if logger is not None:
        logger.info(f"val: recon_loss={val_loss:.6f}")
    return val_loss


def main(cfg: EasyConfig) -> dict:
    import jax
    import jax.numpy as jnp

    setup_logger_dist(cfg.get("log_path"), jax.process_index(), name="geot_tpu")
    logger = logging.getLogger()
    writer = SummaryWriter(cfg.get("run_dir")) if cfg.get("run_dir") else None

    # device mesh: shared policy with the segmentation driver
    from ..parallel import auto_mesh
    mesh = auto_mesh(cfg, logger)
    put = make_device_put(mesh)

    train_loader = build_dataloader_from_cfg(
        cfg.get("batch_size", 2), cfg.dataset, cfg.get("dataloader"),
        cfg.get("datatransforms"), split="train", seed=cfg.get("seed", 0))
    val_loader = build_dataloader_from_cfg(
        cfg.get("batch_size_val", cfg.get("batch_size", 2)), cfg.dataset,
        cfg.get("dataloader"), cfg.get("datatransforms"), split="val",
        seed=cfg.get("seed", 0))
    logger.info(f"datasets: train={len(train_loader.dataset)} "
                f"val={len(val_loader.dataset)}")

    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    init_batch = _pretrain_batch(next(iter(train_loader)), put)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, init_batch)
    from ..core.metrics import cal_model_parm_nums
    logger.info(f"model params: "
                f"{cal_model_parm_nums(variables['params']) / 1e6:.3f} M")

    tx = build_optimizer_from_cfg(None, lr=cfg.lr, **cfg.optimizer)
    schedule = build_scheduler_from_cfg(cfg)
    state = TrainState.create(variables, tx)
    step = make_pretrain_step(model, tx, cfg)
    eval_step = make_pretrain_eval_step(model)

    start_epoch = int(cfg.get("start_epoch", 1))
    best = {"loss": float("inf"), "epoch": 0}
    if cfg.get("mode") == "resume":
        if not (cfg.get("pretrained_path")
                and os.path.isdir(str(cfg["pretrained_path"]))):
            # never silently restart pretraining from scratch (train.py
            # resume semantics; round-3 review finding)
            raise FileNotFoundError(
                f"mode=resume requires pretrained_path pointing at a "
                f"checkpoint directory; got {cfg.get('pretrained_path')!r}")
        from .checkpoint import load_checkpoint
        state, ckpt_epoch, extra = load_checkpoint(cfg["pretrained_path"], state)
        start_epoch = int(ckpt_epoch) + 1
        # restore the saved best metric too, else the first post-resume val
        # overwrites *_ckpt_best with a possibly-worse model (train.py:321
        # semantics; round-3 review finding)
        best.update(extra or {})
        logger.info(f"resumed from {cfg['pretrained_path']} at epoch "
                    f"{ckpt_epoch} (best={best})")

    if mesh is not None:
        from ..parallel import shard_state
        state = shard_state(state, mesh)
    results = {}
    for epoch in range(start_epoch, int(cfg.epochs) + 1):
        train_loader.set_epoch(epoch)
        lr = jnp.asarray(schedule(epoch), dtype=jnp.float32)
        ep_dev, ep_n, t0 = None, 0, time.time()
        for dev_b in device_prefetch(iter(train_loader),
                                     lambda b: _pretrain_batch(b, put)):
            state, metrics = step(state, dev_b, lr)
            ep_dev = metrics["loss"] if ep_dev is None else ep_dev + metrics["loss"]
            ep_n += 1
        train_loss = float(jax.device_get(ep_dev)) / max(ep_n, 1)
        logger.info(f"epoch {epoch}/{cfg.epochs} lr={float(lr):.6f} "
                    f"recon_loss={train_loss:.6f} ({time.time() - t0:.1f}s)")
        if writer:
            writer.add_scalar("lr", float(lr), epoch)
            writer.add_scalar("train_loss", train_loss, epoch)

        if epoch % int(cfg.get("val_freq", 10)) == 0 or epoch == int(cfg.epochs):
            val_loss = validate_pretrain(eval_step, state.variables,
                                         val_loader, put, logger)
            results["val_loss"] = val_loss
            is_best = val_loss <= best["loss"]
            if is_best:
                best.update(loss=val_loss, epoch=epoch)
            if writer:
                writer.add_scalar("val_loss", val_loss, epoch)
            if cfg.get("ckpt_dir"):
                save_checkpoint(cfg, state, epoch, additional_dict=best,
                                is_best=is_best, save_freq=cfg.get("save_freq"))
    results["best"] = best
    if writer:
        writer.close()
    return results


def parse_and_run(argv=None):
    from .train import parse_and_run as train_parse
    return train_parse(argv)


if __name__ == "__main__":
    from .train import parse_and_run as _pr
    _pr()
