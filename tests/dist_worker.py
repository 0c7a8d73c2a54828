"""Worker process for the 2-process ``jax.distributed`` integration test.

Launched by ``test_multiprocess_dist.py`` (not collected by pytest — no
``test_`` prefix).  Each worker joins the distributed runtime through the
REAL engine wiring (``cfg.jax_distributed`` -> ``jax.distributed.initialize``
in ``engine/train.py``), runs the tiny smoke semi config with per-host loader
shards over a global dp mesh, and dumps its results to JSON for the parent to
compare against the single-process trajectory.

Reference analog: one DDP rank of ``mp.spawn(main, nprocs=world_size)``
(``/root/reference/examples/segmentation/train.py:957-963``,
``openpoints/utils/dist_utils.py:6-46``).
"""
import json
import os
import sys

# shared between the workers and the parent's single-process baseline: any
# drift here would invalidate the trajectory comparison.  drop_path and the
# seg-head dropout are OFF because dropout masks depend on the row's position
# in the global batch, and the host-sharded global batch is a (loss-invariant)
# row permutation of the single-process one — with dropout on, the
# trajectories differ by ~1e-3 realization noise (measured), drowning real
# batch-assembly bugs of the same magnitude.
OVERRIDES = [
    "batch_size_l=8", "batch_size_u=8", "epochs=2", "val_freq=2",
    "test_freq=1000", "seed=3", "dataloader.num_workers=2",
    "model.segmentor_args.drop_path_rate=0.0",
    "model_t.segmentor_args.drop_path_rate=0.0",
    "model.segmentor_args.head_dropout=0.0",
    "model_t.segmentor_args.head_dropout=0.0",
]


def main():
    port, pid, nproc, run_root = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    # must precede ANY jax backend use — importing geot_tpu touches the
    # backend, so join the distributed runtime first (engine main() skips
    # its own initialize when already joined)
    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.train import main as train_main

    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs", "tooth_semi", "smoke.yaml"),
             recursive=True)
    cfg.update(list(OVERRIDES))
    extra = os.environ.get("GEOT_DIST_EXTRA_OVERRIDES")
    if extra:
        cfg.update(json.loads(extra))
    cfg.jax_distributed = {"coordinator_address": f"localhost:{port}",
                           "num_processes": nproc, "process_id": pid}
    # SHARED run/ckpt dir, like real multi-host training on shared storage:
    # the rank-gating under test is what keeps this race-free
    cfg.run_dir = os.path.join(run_root, "run")
    cfg.ckpt_dir = os.path.join(run_root, "run", "checkpoint")
    cfg.run_name = "dist"
    os.makedirs(cfg.ckpt_dir, exist_ok=True)

    results = train_main(cfg)

    import jax

    out = {
        "process": jax.process_index(),
        "process_count": jax.process_count(),
        "n_devices": len(jax.devices()),
        "val": {k: float(v) for k, v in results.get("val", {}).items()},
    }
    with open(os.path.join(run_root, f"result_p{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
