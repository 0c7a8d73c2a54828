"""Perfetto-profile the flagship semi-supervised TRAINING step.

    python scripts/profile_train.py [--dtype float32] [--iters 4] [--teacher 0]

Same honest-timing rules as profile_fwd.py (never-repeated buffers — the
donated state chain guarantees that — scalar fetch as barrier, perfetto trace
parsed locally).  Builds the step exactly as ``engine/train.py`` does for
``cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml`` (B=2 labeled +
2 unlabeled, 16k points, Poly1Focal + U_corr + 3d manifold loss k=32) but on
random clouds — the device profile does not depend on the data values.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="float32",
                   help="model compute dtype (train default float32)")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--teacher", type=int, default=0,
                   help="1 = teacher phase (epoch<=switch_ep), 0 = student-weak")
    p.add_argument("--top", type=int, default=24)
    p.add_argument("--points", type=int, default=16000)
    p.add_argument("--threed-k", type=int, default=32)
    p.add_argument("--threed-anchors", type=int, default=0,
                   help="subsampled 3d-loss anchor count (0 = all points)")
    p.add_argument("--no-3d", action="store_true",
                   help="disable the 3d manifold loss (op attribution)")
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

    b_l = b_u = 2
    n_points = args.points
    cfg = EasyConfig({
        "criterion_args": {"NAME": "Poly1FocalLoss"},
        "criterion_u_args": {"NAME": "Poly1FocalLoss_U_corr"},
        "num_classes": 17, "grad_norm_clip": 1.0, "threshold": 0.0,
        "unsupervised_loss_weight": 1.0, "lambma": 0.9, "geo_lambma": 0.999,
        "ema_t_decay": 0.999, "use_3d_loss": not args.no_3d,
        "threed_k": args.threed_k, "threed_anchors": args.threed_anchors,
        "threed_sigma": 1.0, "threed_loss_weight": 0.1,
        "batch_size_l": b_l, "batch_size_u": b_u, "seed": 0})

    seg = dict(FLAGSHIP_SEG_ARGS)
    if args.dtype != "float32":
        seg["dtype"] = args.dtype
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": seg})
    t_pred = build_model_from_cfg(
        {"NAME": "Ins_T_mean", "T_args": {"NAME": "sig_t_mean", "nclasses": 17}})

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def mk(b):
        return jnp.asarray(rng.standard_normal((b, n_points, 3)).astype(np.float32))

    def fresh_l():
        pos = mk(b_l)
        return {"pos": pos, "x": pos, "cls": jnp.zeros((b_l, 1), jnp.int32),
                "y": jnp.asarray(rng.integers(0, 17, (b_l, n_points)), jnp.int32),
                "class_weights": jnp.full((b_l, 17), 1 / 17, jnp.float32)}

    def fresh_u():
        pos_w, pos_s = mk(b_u), mk(b_u)
        return {"pos_w": pos_w, "x_w": pos_w,
                "cls_w": jnp.zeros((b_u, 1), jnp.int32),
                "pos_s": pos_s, "x_s": pos_s,
                "cls_s": jnp.zeros((b_u, 1), jnp.int32), "raw_pos": pos_w,
                "y": jnp.zeros((b_u, n_points), jnp.int32)}

    variables = jax.jit(model.init)(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, fresh_l())
    t_vars = t_pred.init(jax.random.fold_in(key, 2),
                         jnp.full((1, 8, 17), 1 / 17), jnp.eye(17))
    tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw",
                                  weight_decay=1e-4)
    t_tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    state = SemiTrainState.create(variables, tx, t_vars, t_tx, 17,
                                  jax.random.fold_in(key, 3),
                                  contrast_dim=seg["trans_dim"])
    step = make_semi_step(model, model, t_pred, tx, t_tx, cfg)
    use_teacher = bool(args.teacher)

    lr = jnp.asarray(1e-3, jnp.float32)
    # two warmup steps (compile + stabilise), chained state = fresh buffers
    t0 = time.time()
    state, m = step(state, fresh_l(), fresh_u(), lr, use_teacher)
    print(f"compile+step1: {time.time() - t0:.1f}s loss={float(m['loss']):.4f}",
          flush=True)
    state, m = step(state, fresh_l(), fresh_u(), lr, use_teacher)
    float(m["loss"])

    # wall-clock: dispatch all, fetch last
    batches = [(fresh_l(), fresh_u()) for _ in range(args.iters)]
    t0 = time.time()
    for bl, bu in batches:
        state, m = step(state, bl, bu, lr, use_teacher)
    wall = None
    float(m["loss"])
    wall = (time.time() - t0) / args.iters

    tdir = tempfile.mkdtemp(prefix="geot_train_trace_")
    batches = [(fresh_l(), fresh_u()) for _ in range(args.iters)]
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    for bl, bu in batches:
        state, m = step(state, bl, bu, lr, use_teacher)
    float(m["loss"])
    jax.profiler.stop_trace()

    fn = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)[0]
    ev = json.load(gzip.open(fn))["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p_ for p_, n in pid_names.items() if "TPU" in n]
    agg = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            name = e["name"]
            # skip the enclosing jit_* region and the per-core thread
            # totals (bare-digit names) — both double-count the leaf ops
            if name.startswith("jit_") or name.isdigit():
                continue
            agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
    total = sum(agg.values()) / 1e3 / args.iters
    print(f"trace: {fn}")
    print(f"dtype={args.dtype} teacher={use_teacher} "
          f"wall {wall * 1e3:.1f} ms/step, device total {total:.2f} ms/step")
    for k, v in sorted(agg.items(), key=lambda x: -x[1])[:args.top]:
        print(f"  {v / 1e3 / args.iters:8.3f} ms/iter  {k}")


if __name__ == "__main__":
    main()
