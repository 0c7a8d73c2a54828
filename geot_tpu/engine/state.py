"""Train-state pytrees.

The reference mutates state all over the process (model params, two
optimizers, EMA matrices, memory queues, BN running stats, teacher weights —
SURVEY.md §7 hard-part 4).  Here it is ONE immutable pytree threaded through a
jitted step and donated, so XLA updates it in place on device.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ..losses.contrast import ContrastState


def _ema_init(params, ema: bool):
    """Fresh EMA tree = a deep copy of the params (no startup-bias correction
    needed), or an empty dict when EMA evaluation is off.  An empty dict (not
    ``None``) keeps the pytree/serialization structure regular."""
    if not ema:
        return {}
    return jax.tree_util.tree_map(jnp.copy, params)


@flax.struct.dataclass
class TrainState:
    """Supervised training state."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray          # ()
    # Polyak/EMA shadow of ``params`` for evaluation (``cfg.ema_eval``
    # decay) — a capability beyond the reference.  Empty dict when disabled.
    ema_params: Any = flax.struct.field(default_factory=dict)

    @classmethod
    def create(cls, variables, tx, ema: bool = False):
        params = variables["params"]
        return cls(params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32),
                   ema_params=_ema_init(params, ema))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def eval_variables(self):
        """Variables for evaluation: the EMA weights when maintained, the raw
        weights otherwise.  Batch stats are shared (they are already running
        averages with momentum 0.9 — a second EMA would double-lag them)."""
        params = self.ema_params if self.ema_params else self.params
        return {"params": params, "batch_stats": self.batch_stats}


@flax.struct.dataclass
class SemiTrainState:
    """Full GeoT semi-supervised state: student + frozen teacher +
    T-predictor (own optimizer) + NTM EMA + class-mean matrix + contrast bank
    + PRNG."""

    params: Any                 # student
    batch_stats: Any
    opt_state: Any
    t_params: Any               # T-predictor (Ins_T_mean)
    t_opt_state: Any
    teacher_params: Any         # frozen
    teacher_batch_stats: Any
    ema_t: jnp.ndarray          # (C, C)
    cm: jnp.ndarray             # (C, C) class-mean softmax matrix
    contrast: ContrastState
    rng: jax.Array
    step: jnp.ndarray
    # Polyak/EMA shadow of the student ``params`` for evaluation
    # (``cfg.ema_eval`` decay); empty dict when disabled
    ema_params: Any = flax.struct.field(default_factory=dict)

    @classmethod
    def create(cls, variables, tx, t_variables, t_tx, num_classes: int,
               rng, teacher_variables=None, contrast_dim: int = 384,
               contrast_queue: int = 4096, ema: bool = False):
        teacher_variables = teacher_variables or variables
        # deep-copy teacher buffers: the state is donated each step, and
        # XLA rejects donating the same buffer twice if teacher aliases student
        teacher_variables = jax.tree_util.tree_map(jnp.copy, teacher_variables)
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            t_params=t_variables["params"],
            t_opt_state=t_tx.init(t_variables["params"]),
            teacher_params=teacher_variables["params"],
            teacher_batch_stats=teacher_variables.get("batch_stats", {}),
            ema_t=jnp.eye(num_classes),
            cm=jnp.eye(num_classes),
            contrast=ContrastState.create(jax.random.fold_in(rng, 7),
                                          queue_size=contrast_queue,
                                          dim=contrast_dim),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
            ema_params=_ema_init(variables["params"], ema),
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def eval_variables(self):
        """See ``TrainState.eval_variables`` — student EMA weights when
        maintained, raw student weights otherwise."""
        params = self.ema_params if self.ema_params else self.params
        return {"params": params, "batch_stats": self.batch_stats}

    @property
    def teacher_variables(self):
        return {"params": self.teacher_params,
                "batch_stats": self.teacher_batch_stats}
