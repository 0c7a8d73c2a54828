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


@flax.struct.dataclass
class TrainState:
    """Supervised training state."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray          # ()

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


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

    @classmethod
    def create(cls, variables, tx, t_variables, t_tx, num_classes: int,
               rng, teacher_variables=None, contrast_dim: int = 384,
               contrast_queue: int = 4096):
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
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def teacher_variables(self):
        return {"params": self.teacher_params,
                "batch_stats": self.teacher_batch_stats}
