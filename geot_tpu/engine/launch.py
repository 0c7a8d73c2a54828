"""Multi-process training launcher — the ``mp.spawn`` analogue.

The reference launches one DDP process per GPU over a free-port TCP
rendezvous (``examples/segmentation/train.py:957-963`` ``mp.spawn`` +
``utils/dist_utils.py:46`` ``find_free_port``).  The TPU-native equivalent
spawns one process per HOST (devices within a host are handled by GSPMD, not
by processes), joined through ``jax.distributed``:

    # single node, 2 processes (e.g. CPU testing, or 2 local TPU slices)
    python -m geot_tpu.engine.launch --nprocs 2 -- \
        --cfg cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml k=v ...

    # node 1 of a 2-node job (run once per node)
    python -m geot_tpu.engine.launch --nprocs 1 --nnodes 2 --node-rank 1 \
        --coordinator host0:12345 -- --cfg ...

Every rank runs ``engine.train`` with an explicit ``jax_distributed``
coordinator dict.  The launcher pre-creates ONE shared run directory and
passes it to every rank: orbax's multi-host-coordinated checkpoint save
requires identical paths, and the engine rank-gates the scalar writer and
host-side checkpoint swaps itself (``engine/checkpoint.py``).  Rank stdout
goes to ``<run_dir>/rank<i>.log``; rank 0 is also streamed through.  A
failing rank terminates the others (fail-fast, like torchrun).

``--devices-per-proc N`` forces the CPU backend with N virtual devices per
process — the no-hardware test mode (``tests/test_launch.py``).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


# jax.distributed.initialize must precede ANY jax backend use, and importing
# geot_tpu touches the backend — so each rank boots through a -c stub that
# joins the runtime first (engine main() skips its own initialize when
# already joined)
_BOOTSTRAP = (
    "import sys, jax\n"
    "addr, n, i = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])\n"
    "jax.distributed.initialize(addr, num_processes=n, process_id=i)\n"
    "from geot_tpu.engine.train import parse_and_run\n"
    "parse_and_run(sys.argv[4:])\n"
)


def _build_cmd(train_args, port, process_id, num_processes, run_dir,
               run_name, coordinator):
    addr = coordinator or f"localhost:{port}"
    return [sys.executable, "-c", _BOOTSTRAP, addr, str(num_processes),
            str(process_id), *train_args, f"run_dir={run_dir}",
            f"run_name={run_name}"]


def main(argv=None):
    parser = argparse.ArgumentParser(
        "geot_tpu multi-process launcher (mp.spawn analogue)")
    parser.add_argument("--nprocs", type=int, required=True,
                        help="processes to spawn on THIS node")
    parser.add_argument("--nnodes", type=int, default=1)
    parser.add_argument("--node-rank", type=int, default=0)
    parser.add_argument("--coordinator", default=None,
                        help="host:port of rank 0 (required when nnodes>1; "
                             "defaults to localhost:<free port>)")
    parser.add_argument("--run-dir", default=None,
                        help="shared run directory (default: "
                             "./log/launch/<timestamp>)")
    parser.add_argument("--devices-per-proc", type=int, default=None,
                        help="force the CPU backend with N virtual devices "
                             "per process (testing without hardware)")
    parser.add_argument("train_args", nargs=argparse.REMAINDER,
                        help="-- followed by engine.train arguments")
    args = parser.parse_args(argv)
    train_args = args.train_args
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    if not train_args:
        parser.error("pass the training command after '--', e.g. "
                     "-- --cfg cfgs/tooth_semi/smoke.yaml")
    if args.nnodes > 1 and not args.coordinator:
        parser.error("--coordinator host:port is required when nnodes > 1")
    if args.nnodes > 1 and not args.run_dir:
        # orbax's multi-host-coordinated save requires IDENTICAL paths on
        # every rank; a per-node timestamp default would desync them
        parser.error("--run-dir is required when nnodes > 1 (every node must "
                     "share one run directory for coordinated checkpoints)")

    from ..parallel import find_free_port

    port = find_free_port()
    num_processes = args.nnodes * args.nprocs
    run_dir = args.run_dir or os.path.join(
        "log", "launch", time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(run_dir, exist_ok=True)
    run_name = os.path.basename(os.path.normpath(run_dir))

    env = dict(os.environ)
    if args.devices_per_proc:
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                            f"{args.devices_per_proc}")

    procs, logs = [], []
    for local in range(args.nprocs):
        rank = args.node_rank * args.nprocs + local
        cmd = _build_cmd(train_args, port, rank, num_processes, run_dir,
                         run_name, args.coordinator)
        log = open(os.path.join(run_dir, f"rank{rank}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=log, stderr=subprocess.STDOUT))
    print(f"launched {args.nprocs} process(es) "
          f"(global ranks {args.node_rank * args.nprocs}.."
          f"{args.node_rank * args.nprocs + args.nprocs - 1} of "
          f"{num_processes}); logs in {run_dir}/rank*.log", flush=True)

    # fail-fast supervision: one dead rank hangs the others on their next
    # collective, so terminate the group as soon as any rank exits nonzero
    rc = 0
    try:
        while procs:
            for p in list(procs):
                code = p.poll()
                if code is None:
                    continue
                procs.remove(p)
                if code != 0:
                    rc = code
                    print(f"rank exited with {code}; terminating the rest",
                          file=sys.stderr, flush=True)
                    for q in procs:
                        q.terminate()
                    for q in procs:
                        try:
                            q.wait(timeout=30)
                        except subprocess.TimeoutExpired:
                            # a rank wedged in a collective ignores SIGTERM
                            q.kill()
                            q.wait()
                    procs = []
                    break
            time.sleep(0.5)
    finally:
        for log in logs:
            log.close()
    if rc == 0:
        print(f"all ranks finished; run dir {run_dir}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
