"""Strip a full training checkpoint (params + optimizer + EMA side-state,
~420 MB for the flagship) down to a params-only artifact (params +
batch_stats, ~96 MB) in the full ``save_checkpoint`` payload shape, so it
feeds ``load_variables``, the predict/serve/export CLIs AND params-only
``mode=resume``.

    python scripts/make_params_only.py <full_ckpt_dir> <out_dir> [--ema]

``--ema``: export the Polyak-averaged evaluation weights (``ema_params``,
maintained under ``cfg.ema_eval``) as the artifact's ``params`` — what the
run's own validation evaluated; errors if the checkpoint has no EMA shadow.

CPU-safe (no accelerator needed).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import orbax.checkpoint as ocp

    args = [a for a in sys.argv[1:] if a != "--ema"]
    use_ema = "--ema" in sys.argv[1:]
    src, out = os.path.abspath(args[0]), os.path.abspath(args[1])
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(src)
        st = payload["state"]
        if use_ema and not st.get("ema_params"):
            raise SystemExit(f"{src} carries no ema_params (run trained "
                             f"without cfg.ema_eval)")
        v = {"params": st["ema_params"] if use_ema else st["params"]}
        if st.get("batch_stats"):
            v["batch_stats"] = st["batch_stats"]
        slim = {"state": v, "epoch": payload.get("epoch", 0),
                "extra": payload.get("extra", {})}
        ckptr.save(out, slim)
        ckptr.wait_until_finished()
    import jax

    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(v["params"]))
    print(f"{src} -> {out} ({n / 1e6:.3f} M params, epoch "
          f"{slim['epoch']}, extra={slim['extra']})")


if __name__ == "__main__":
    main()
