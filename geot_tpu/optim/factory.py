"""Optimizer + LR-schedule factories over optax.

Reference: ``openpoints/optim/optim_factory.py:156`` (vendored timm optimizers,
~2100 LoC of CUDA-era implementations) and
``openpoints/scheduler/scheduler_factory.py:12`` — here each optimizer is an
optax alias and each schedule an epoch-indexed function; the per-epoch
``scheduler.step(epoch)`` of the reference becomes
``optax.inject_hyperparams`` so the learning rate is a plain scalar in the
optimizer state (donated, updated on-device).

Weight-decay filtering matches the reference default: biases, norm scales and
any rank-<2 parameter get no decay (``optim_factory.py:31-55``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax


def _decay_mask(params) -> Any:
    """True for params that receive weight decay: rank >= 2 (kernels)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


_OPTIMIZERS: Dict[str, Callable] = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _OPTIMIZERS[n] = fn
        return fn
    return deco


@_register("adamw")
def _adamw(lr, weight_decay=1e-4, betas=(0.9, 0.999), eps=1e-8, filter_bias_and_bn=True, **kw):
    mask = _decay_mask if filter_bias_and_bn else None
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay, mask=mask)


@_register("adam")
def _adam(lr, betas=(0.9, 0.999), eps=1e-8, **kw):
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


@_register("sgd", "momentum")
def _sgd(lr, momentum=0.9, weight_decay=0.0, nesterov=True, filter_bias_and_bn=True, **kw):
    tx = optax.sgd(lr, momentum=momentum, nesterov=nesterov)
    if weight_decay:
        mask = _decay_mask if filter_bias_and_bn else None
        tx = optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
    return tx


@_register("lamb")
def _lamb(lr, weight_decay=0.0, **kw):
    return optax.lamb(lr, weight_decay=weight_decay,
                      mask=_decay_mask if weight_decay else None)


@_register("lars")
def _lars(lr, weight_decay=0.0, momentum=0.9, **kw):
    return optax.lars(lr, weight_decay=weight_decay, momentum=momentum)


@_register("adabelief")
def _adabelief(lr, betas=(0.9, 0.999), eps=1e-16, **kw):
    return optax.adabelief(lr, b1=betas[0], b2=betas[1], eps=eps)


@_register("radam")
def _radam(lr, betas=(0.9, 0.999), **kw):
    return optax.radam(lr, b1=betas[0], b2=betas[1])


@_register("nadam")
def _nadam(lr, betas=(0.9, 0.999), **kw):
    return optax.nadam(lr, b1=betas[0], b2=betas[1])


@_register("novograd", "nvnovograd")
def _novograd(lr, betas=(0.95, 0.98), weight_decay=0.0, **kw):
    return optax.novograd(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)


@_register("adafactor")
def _adafactor(lr, **kw):
    return optax.adafactor(lr)


@_register("rmsprop", "rmsprop_tf", "rmsproptf")
def _rmsprop_tf(lr, alpha=0.9, eps=1e-10, momentum=0.9, **kw):
    # tf/timm-style: eps inside the sqrt, accumulator initialised to 1
    return optax.rmsprop(lr, decay=alpha, eps=eps, initial_scale=1.0,
                         eps_in_sqrt=True, momentum=momentum or None)


@_register("adamp")
def _adamp(lr, weight_decay=1e-4, betas=(0.9, 0.999), eps=1e-8,
           delta=0.1, wd_ratio=0.1, nesterov=False, filter_bias_and_bn=True, **kw):
    from .extra import adamp
    return adamp(lr, b1=betas[0], b2=betas[1], eps=eps,
                 weight_decay=weight_decay, delta=delta, wd_ratio=wd_ratio,
                 nesterov=nesterov, filter_bias_and_bn=filter_bias_and_bn)


@_register("sgdp")
def _sgdp(lr, momentum=0.9, weight_decay=1e-4, nesterov=True,
          delta=0.1, wd_ratio=0.1, filter_bias_and_bn=True, **kw):
    from .extra import sgdp
    return sgdp(lr, momentum=momentum, weight_decay=weight_decay,
                nesterov=nesterov, delta=delta, wd_ratio=wd_ratio,
                filter_bias_and_bn=filter_bias_and_bn)


@_register("madgrad")
def _madgrad(lr, momentum=0.9, weight_decay=0.0, eps=1e-6, **kw):
    from .extra import madgrad
    return madgrad(lr, momentum=momentum, weight_decay=weight_decay, eps=eps)


def build_optimizer_from_cfg(params_or_model=None, lr: float = 1e-3,
                             every_k: int = 1, **cfg):
    """Return an optax transform with injected lr.

    Mirrors ``build_optimizer_from_cfg`` (reference ``optim_factory.py:156``):
    dispatch on ``NAME``, weight-decay filtering on by default.  The first
    positional arg (a torch model in the reference) is ignored — parameters
    are bound at ``tx.init(params)`` time in JAX.  ``every_k > 1`` wraps in
    ``optax.MultiSteps`` (gradient accumulation — the reference's
    ``cfg.step_per_update``).
    """
    name = cfg.pop("NAME", "adamw").lower()
    # "lookahead_sgd" / "lookaheadadamw": the reference's timm-style prefix
    # (optim_factory.py: opt.split('_') with a Lookahead wrapper)
    la_kwargs = None
    for prefix in ("lookahead_", "lookahead"):
        if name.startswith(prefix) and name != "lookahead":
            la_kwargs = {"alpha": cfg.pop("lookahead_alpha", 0.5),
                         "k": cfg.pop("lookahead_k", 6)}
            name = name[len(prefix):]
            break
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name}; known: {sorted(_OPTIMIZERS)}")
    factory = _OPTIMIZERS[name]

    def make(lr_value):
        tx = factory(lr_value, **cfg)
        if la_kwargs is not None:
            from .extra import lookahead
            tx = optax.chain(tx, lookahead(**la_kwargs))
        return tx

    # inject_hyperparams exposes state.hyperparams['lr_value'] for per-epoch updates
    tx = optax.inject_hyperparams(make)(lr_value=lr)
    if every_k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=every_k)
    return tx


def build_scheduler_from_cfg(cfg, optimizer=None):
    """Epoch -> lr function (reference ``scheduler_factory.py:12-60``).

    Supported ``cfg.sched``: multistep, step, cosine, tanh, poly, none; with
    ``warmup_epochs``/``warmup_lr``.  The reference's plateau scheduler is
    metric-driven and host-side — see ``engine.train`` for its equivalent.
    """
    cfg = dict(cfg)
    sched = cfg.get("sched", "multistep")
    lr = float(cfg.get("lr", 1e-3))
    epochs = int(cfg.get("epochs", 300))
    min_lr = cfg.get("min_lr") or 0.0
    warmup_epochs = int(cfg.get("warmup_epochs", 0) or 0)
    warmup_lr = cfg.get("warmup_lr", 1e-6)
    warmup_lr = 1e-6 if warmup_lr is None else float(warmup_lr)

    if sched == "multistep":
        decay_epochs = list(cfg.get("decay_epochs", [220]))
        rate = float(cfg.get("decay_rate", 0.1))

        def schedule(epoch):
            factor = 1.0
            for e in decay_epochs:
                if epoch >= e:
                    factor *= rate
            return lr * factor
    elif sched == "step":
        decay_every = int(cfg.get("decay_epochs", 30) if not isinstance(
            cfg.get("decay_epochs"), (list, tuple)) else cfg["decay_epochs"][0])
        rate = float(cfg.get("decay_rate", 0.1))

        def schedule(epoch):
            return lr * (rate ** (epoch // max(decay_every, 1)))
    elif sched == "cosine":
        import math

        def schedule(epoch):
            t = min(max(epoch - warmup_epochs, 0) / max(epochs - warmup_epochs, 1), 1.0)
            return min_lr + (lr - min_lr) * 0.5 * (1 + math.cos(math.pi * t))
    elif sched == "tanh":
        import math

        def schedule(epoch):
            t = min(max(epoch - warmup_epochs, 0) / max(epochs - warmup_epochs, 1), 1.0)
            return min_lr + (lr - min_lr) * 0.5 * (1 - math.tanh(3.0 * (2 * t - 1)))
    elif sched == "poly":
        power = float(cfg.get("decay_rate", 0.9))

        def schedule(epoch):
            t = min(max(epoch - warmup_epochs, 0) / max(epochs - warmup_epochs, 1), 1.0)
            return (lr - min_lr) * ((1 - t) ** power) + min_lr
    elif sched in ("none", None):
        def schedule(epoch):
            return lr
    else:
        raise ValueError(f"unknown scheduler {sched}")

    if warmup_epochs > 0:
        base = schedule

        def schedule(epoch):  # noqa: F811
            if epoch < warmup_epochs:
                return warmup_lr + (lr - warmup_lr) * epoch / warmup_epochs
            return base(epoch)

    return schedule


def set_learning_rate(opt_state, lr_value: float):
    """Write the scheduled lr into an inject_hyperparams state (the JAX
    equivalent of the reference's ``scheduler.step(epoch)`` mutating the torch
    optimizer's param_groups).  Handles MultiSteps-wrapped states."""
    inner = getattr(opt_state, "inner_opt_state", opt_state)
    inner.hyperparams["lr_value"] = jax.numpy.asarray(lr_value,
                                                      dtype=jax.numpy.float32)
    return opt_state
