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


def _layer_id_from_path(path) -> int | None:
    """ViT layer id of a param path (reference ``get_num_layer_for_vit``,
    ``optim_factory.py:77-90``): embeddings -> 0, ``block_i`` -> i + 1,
    everything else (decoder/head) -> None (max id, lr scale 1)."""
    import re

    keys = [getattr(k, "key", str(k)) for k in path]
    for k in keys:
        m = re.fullmatch(r"blocks?_(\d+)|block_(\d+)", k)
        if m:
            return int(m.group(1) or m.group(2)) + 1
    joined = "/".join(keys)
    if any(s in joined for s in ("encoder/", "pos_embed", "reduce_dim",
                                 "cls_token", "cls_pos", "patch_embed")):
        return 0
    return None


def layer_decay_scale(layer_decay: float) -> optax.GradientTransformation:
    """Per-layer learning-rate decay as a final update scale (the JAX
    equivalent of the reference's ``LayerDecayValueAssigner`` param groups,
    ``optim_factory.py:58-120``): layer id i gets scale
    ``layer_decay ** (num_layers + 1 - i)``; the head/decoder gets 1.0.
    ``num_layers`` is discovered from the params tree (max block index + 1),
    mirroring the reference's ``model.get_num_layers()``."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        flat = jax.tree_util.tree_flatten_with_path(updates)[0]
        ids = [_layer_id_from_path(p) for p, _ in flat]
        num_layers = max([i for i in ids if i is not None], default=0)

        def scale(path, u):
            lid = _layer_id_from_path(path)
            if lid is None:
                return u
            return u * (layer_decay ** (num_layers + 1 - lid))

        return (jax.tree_util.tree_map_with_path(scale, updates), state)

    return optax.GradientTransformation(init, update)


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


@_register("adahessian")
def _adahessian(lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
                hessian_power=1.0, **kw):
    # second-order: update() requires the extra ``hessian_diag`` pytree —
    # compute it per step with ``optim.adahessian.hutchinson_diag`` (one
    # jax.jvp through the grad fn; the reference needs a full double
    # backward, ``openpoints/optim/adahessian.py:75-100``)
    from .adahessian import adahessian
    return adahessian(lr, b1=betas[0], b2=betas[1], eps=eps,
                      weight_decay=weight_decay, hessian_power=hessian_power)


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
    layer_decay = float(cfg.pop("layer_decay", 0) or 0)
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
        if 0.0 < layer_decay < 1.0:
            # reference optim_factory.py:177-186 (per-layer lr decay)
            tx = optax.chain(tx, layer_decay_scale(layer_decay))
        return tx

    # inject_hyperparams exposes state.hyperparams['lr_value'] for per-epoch updates
    tx = optax.inject_hyperparams(make)(lr_value=lr)
    if every_k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=every_k)
    return tx


class PlateauSchedule:
    """ReduceLROnPlateau (reference ``scheduler_factory.py:101`` via timm
    ``plateau_lr.py:12``): decay the lr by ``decay_rate`` whenever the
    monitored metric fails to improve for ``patience_t`` consecutive
    validations, with linear warmup and a post-decay cooldown.

    Host-side stateful object with the same calling surface as the functional
    schedules — ``schedule(epoch)`` returns the lr — plus ``note_metric(m)``
    which the trainer calls after each validation (the reference's
    ``scheduler.step(epoch, metric)``).  ``state_dict``/``load_state_dict``
    allow resume.
    """

    def __init__(self, lr, decay_rate=0.1, patience_t=10, threshold=1e-4,
                 cooldown_t=0, warmup_epochs=0, warmup_lr=1e-6, min_lr=0.0,
                 mode="max"):
        self.base_lr = float(lr)
        self.decay_rate = float(decay_rate)
        self.patience = int(patience_t)
        self.threshold = float(threshold)
        self.cooldown_t = int(cooldown_t)
        self.warmup_epochs = int(warmup_epochs)
        self.warmup_lr = float(warmup_lr)
        self.min_lr = float(min_lr)
        self.mode = mode
        self.cur = float(lr)
        self.best = None
        self.bad = 0
        self.cooldown = 0

    def _is_better(self, metric):
        # torch ReduceLROnPlateau rel-threshold comparison
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold) if self.best > 0 \
                else metric > self.best + self.threshold
        return metric < self.best * (1.0 - self.threshold) if self.best > 0 \
            else metric < self.best - self.threshold

    def note_metric(self, metric):
        metric = float(metric)
        if self.best is None or self._is_better(metric):
            self.best = metric
            self.bad = 0
            return
        if self.cooldown > 0:
            self.cooldown -= 1
            return
        self.bad += 1
        if self.bad > self.patience:
            self.cur = max(self.cur * self.decay_rate, self.min_lr)
            self.bad = 0
            self.cooldown = self.cooldown_t

    def __call__(self, epoch, metric=None):
        if metric is not None:
            self.note_metric(metric)
        t = max(int(epoch) - 1, 0)   # same 1-based-epoch convention as the
        if self.warmup_epochs > 0 and t < self.warmup_epochs:  # timm ports
            return self.warmup_lr + (self.base_lr - self.warmup_lr) \
                * t / self.warmup_epochs
        return self.cur

    def state_dict(self):
        return {"cur": self.cur, "best": self.best, "bad": self.bad,
                "cooldown": self.cooldown}

    def load_state_dict(self, sd):
        self.cur = sd["cur"]
        self.best = sd["best"]
        self.bad = sd["bad"]
        self.cooldown = sd["cooldown"]


def build_scheduler_from_cfg(cfg, optimizer=None):
    """Epoch -> lr function (reference ``scheduler_factory.py:12-60``).

    Supported ``cfg.sched``: multistep, step, cosine, tanh, poly, plateau,
    none; with ``warmup_epochs``/``warmup_lr``.  ``plateau`` returns a
    stateful :class:`PlateauSchedule` (metric fed by the trainer after each
    validation).
    """
    cfg = dict(cfg)
    sched = cfg.get("sched", "multistep")
    lr = float(cfg.get("lr", 1e-3))
    epochs = int(cfg.get("epochs", 300))
    # reference defaults (``scheduler_factory.py:13-21``): min_lr = lr/1000
    # when unset, decay_rate = 0.01**(1/epochs) when unset
    min_lr = float(cfg["min_lr"]) if cfg.get("min_lr") else lr / 1000.0
    default_rate = 0.01 ** (1.0 / max(epochs, 1))
    t_max = int(cfg.get("t_max") or epochs)
    warmup_epochs = int(cfg.get("warmup_epochs", 0) or 0)
    warmup_lr = cfg.get("warmup_lr", 1e-6)
    warmup_lr = 1e-6 if warmup_lr is None else float(warmup_lr)

    # The trainer evaluates ``schedule(epoch)`` (1-based) at the START of each
    # epoch; the reference steps the timm scheduler with the 0-based epoch
    # after the previous one, so the effective lr for epoch e is the timm
    # value at t = e - 1.  All formulas below are exact timm ports (verified
    # epoch-by-epoch against the reference's vendored schedulers in
    # ``tests/test_sched_parity_torch.py``).
    import math

    def _with_warmup(base_fn):
        def schedule(epoch):
            t = max(int(epoch) - 1, 0)
            if warmup_epochs > 0 and t < warmup_epochs:
                return warmup_lr + t * (lr - warmup_lr) / warmup_epochs
            return base_fn(t)
        return schedule

    if sched == "multistep":
        import bisect

        decay_epochs = sorted(cfg.get("decay_epochs", [220]))
        rate = float(cfg.get("decay_rate") or 0.1)

        def base(t):
            # ``multistep_lr.py:46``: bisect_right(decay_t, t + 1)
            return lr * rate ** bisect.bisect_right(decay_epochs, t + 1)
        schedule = _with_warmup(base)
    elif sched == "step":
        decay_every = int(cfg.get("decay_epochs", 30) if not isinstance(
            cfg.get("decay_epochs"), (list, tuple)) else cfg["decay_epochs"][0])
        rate = float(cfg.get("decay_rate") or default_rate)

        def base(t):
            return lr * (rate ** (t // max(decay_every, 1)))
        schedule = _with_warmup(base)
    elif sched == "cosine":
        def base(t):
            if t >= t_max:                      # past cycle_limit=1 cycle
                return min_lr
            return min_lr + 0.5 * (lr - min_lr) * (
                1 + math.cos(math.pi * t / t_max))
        schedule = _with_warmup(base)
    elif sched == "tanh":
        lb, ub = -7.0, 3.0                      # timm ``tanh_lr.py:27-28``

        def base(t):
            if t >= epochs:
                return min_lr
            tr = t / epochs
            return min_lr + 0.5 * (lr - min_lr) * (
                1 - math.tanh(lb * (1.0 - tr) + ub * tr))
        schedule = _with_warmup(base)
    elif sched == "poly":
        power = float(cfg.get("decay_rate") or 0.9)

        def base(t):
            if t >= epochs:
                return min_lr
            return min_lr + (lr - min_lr) * (1 - t / epochs) ** power
        schedule = _with_warmup(base)
    elif sched == "plateau":
        return PlateauSchedule(
            lr, decay_rate=float(cfg.get("decay_rate", 0.1)),
            patience_t=int(cfg.get("patience_epochs", 10)),
            threshold=float(cfg.get("plateau_threshold", 1e-4)),
            cooldown_t=int(cfg.get("cooldown_epochs", 0) or 0),
            warmup_epochs=warmup_epochs, warmup_lr=warmup_lr, min_lr=min_lr,
            mode=cfg.get("plateau_mode", "max"))
    elif sched in ("none", None):
        def schedule(epoch):
            return lr
    else:
        raise ValueError(f"unknown scheduler {sched}")

    return schedule


def set_learning_rate(opt_state, lr_value: float):
    """Write the scheduled lr into an inject_hyperparams state (the JAX
    equivalent of the reference's ``scheduler.step(epoch)`` mutating the torch
    optimizer's param_groups).  Handles MultiSteps-wrapped states."""
    inner = getattr(opt_state, "inner_opt_state", opt_state)
    inner.hyperparams["lr_value"] = jax.numpy.asarray(lr_value,
                                                      dtype=jax.numpy.float32)
    return opt_state


def add_weight_decay(params, weight_decay: float = 1e-5, skip_list=()):
    """Reference ``optim_factory.py:123-135``: split params into no-decay
    (rank-1 / bias / skip-listed) and decay groups.  JAX form: returns the
    boolean decay MASK pytree (True = decayed) usable as the ``mask`` of any
    optax decay transform, which is how the factory consumes the reference's
    two param groups."""
    import jax

    def decays(path, p):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        if p.ndim <= 1 or name.endswith("bias") or any(
                s in name for s in skip_list):
            return False
        return True

    del weight_decay  # the mask is weight-decay-agnostic; kept for signature
    return jax.tree_util.tree_map_with_path(decays, params)


def get_parameter_groups(params, weight_decay: float = 1e-5, skip_list=(),
                         get_num_layer=None, get_layer_scale=None):
    """Reference ``optim_factory.py:66-120``: name -> group assignment with
    optional per-layer lr scales.  JAX form: returns ``{group_name:
    {"weight_decay": float, "lr_scale": float, "names": [leaf paths]}}`` —
    the diagnostic view of what ``add_weight_decay`` + ``layer_decay_scale``
    apply inside the optax chain."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: Dict[str, Dict] = {}
    for path, p in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        if p.ndim <= 1 or name.endswith("bias") or any(
                s in name for s in skip_list):
            gname, wd = "no_decay", 0.0
        else:
            gname, wd = "decay", weight_decay
        scale = 1.0
        if get_num_layer is not None:
            lid = get_num_layer(name)
            gname = f"layer_{lid}_{gname}"
            if get_layer_scale is not None:
                scale = get_layer_scale(lid)
        g = groups.setdefault(gname, {"weight_decay": wd, "lr_scale": scale,
                                      "names": []})
        g["names"].append(name)
    return groups


def optimizer_kwargs(cfg):
    """cfg/argparse -> ``build_optimizer_from_cfg`` kwargs
    (reference ``optim_factory.py:138-152``)."""
    get = (cfg.get if isinstance(cfg, dict)
           else lambda k, d=None: getattr(cfg, k, d))
    kwargs = dict(NAME=get("opt", get("NAME", "adamw")), lr=get("lr"),
                  weight_decay=get("weight_decay", 0.0))
    if get("momentum") is not None:
        kwargs["momentum"] = get("momentum")
    if get("opt_eps") is not None:
        kwargs["eps"] = get("opt_eps")
    if get("opt_betas") is not None:
        kwargs["betas"] = get("opt_betas")
    if get("layer_decay") is not None:
        kwargs["layer_decay"] = get("layer_decay")
    return kwargs
