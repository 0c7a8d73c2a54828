"""Static HBM memory analysis of the flagship executables.

``compiled.memory_analysis()`` reports XLA's buffer assignment (arguments /
outputs / temporaries / peak) without running anything — the relay hides
runtime ``memory_stats``, but the static numbers ARE the allocation the chip
makes.  Run on the TPU backend for the real layouts:

    python scripts/memory_report.py [--points 16000]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def fmt(analysis) -> str:
    g = 1024 ** 3
    return (f"args {analysis.argument_size_in_bytes / g:.2f} GiB, "
            f"outputs {analysis.output_size_in_bytes / g:.2f} GiB, "
            f"temps {analysis.temp_size_in_bytes / g:.2f} GiB, "
            f"peak {(analysis.argument_size_in_bytes + analysis.output_size_in_bytes + analysis.temp_size_in_bytes) / g:.2f} GiB "
            f"(temp-only peak excludes donated aliases)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=16000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import FLAGSHIP_SEG_ARGS
    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.state import SemiTrainState
    from geot_tpu.engine.steps import make_semi_step
    from geot_tpu.models import build_model_from_cfg
    from geot_tpu.optim import build_optimizer_from_cfg

    n = args.points
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- serving forward (bf16, fast flags — the bench configuration) ----
    seg_fast = dict(FLAGSHIP_SEG_ARGS)
    seg_fast.update(dtype="bfloat16", fast_pyramid=1024, fast_graph=True)
    model_fast = build_model_from_cfg({"NAME": "WholePartSeg",
                                       "segmentor_args": seg_fast})
    pos1 = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32))
    b1 = {"pos": pos1, "x": pos1, "cls": jnp.zeros((1, 1), jnp.int32)}
    v = jax.jit(model_fast.init)(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, b1)
    fwd = jax.jit(lambda vv, bb: model_fast.apply(vv, bb, training=False)[0])
    mem = fwd.lower(v, b1).compile().memory_analysis()
    print(f"serving fwd (B=1, {n} pts, bf16, fast): {fmt(mem)}")

    # ---- training step (f32, flagship semi config, B=2+2) ---------------
    cfg = EasyConfig({
        "criterion_args": {"NAME": "Poly1FocalLoss"},
        "criterion_u_args": {"NAME": "Poly1FocalLoss_U_corr"},
        "num_classes": 17, "grad_norm_clip": 1.0, "threshold": 0.0,
        "unsupervised_loss_weight": 1.0, "lambma": 0.9, "geo_lambma": 0.999,
        "ema_t_decay": 0.999, "use_3d_loss": True, "threed_k": 32,
        "threed_sigma": 1.0, "threed_loss_weight": 0.1,
        "batch_size_l": 2, "batch_size_u": 2, "seed": 0})
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": dict(FLAGSHIP_SEG_ARGS)})
    t_pred = build_model_from_cfg(
        {"NAME": "Ins_T_mean", "T_args": {"NAME": "sig_t_mean",
                                          "nclasses": 17}})
    pos2 = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    bl = {"pos": pos2, "x": pos2, "cls": jnp.zeros((2, 1), jnp.int32),
          "y": jnp.zeros((2, n), jnp.int32),
          "class_weights": jnp.full((2, 17), 1 / 17, jnp.float32)}
    pw = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    ps = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    bu = {"pos_w": pw, "x_w": pw, "cls_w": jnp.zeros((2, 1), jnp.int32),
          "pos_s": ps, "x_s": ps, "cls_s": jnp.zeros((2, 1), jnp.int32),
          "raw_pos": pw, "y": jnp.zeros((2, n), jnp.int32)}
    variables = jax.jit(model.init)(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, bl)
    t_vars = t_pred.init(jax.random.fold_in(key, 2),
                         jnp.full((1, 8, 17), 1 / 17), jnp.eye(17))
    tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw",
                                  weight_decay=1e-4)
    t_tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    state = SemiTrainState.create(variables, tx, t_vars, t_tx, 17,
                                  jax.random.fold_in(key, 3),
                                  contrast_dim=seg_fast["trans_dim"])
    step = make_semi_step(model, model, t_pred, tx, t_tx, cfg)
    mem = step.lower(state, bl, bu, jnp.float32(1e-3), False)\
        .compile().memory_analysis()
    print(f"semi train step (B=2+2, {n} pts, f32, student-weak): {fmt(mem)}")


if __name__ == "__main__":
    main()
