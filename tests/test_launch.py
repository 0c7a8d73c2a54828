"""Multi-process launcher (``engine/launch.py``) — the reference's
``mp.spawn`` analogue (``examples/segmentation/train.py:957-963``)."""
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_build_cmd_and_arg_errors():
    from geot_tpu.engine.launch import _build_cmd, main

    cmd = _build_cmd(["--cfg", "x.yaml", "epochs=1"], 123, 1, 4,
                     "/tmp/rd", "rn", None)
    assert cmd[0] == sys.executable and cmd[1] == "-c"
    assert cmd[3:6] == ["localhost:123", "4", "1"]
    assert "run_dir=/tmp/rd" in cmd and "run_name=rn" in cmd
    # explicit coordinator wins over the free port
    cmd = _build_cmd(["--cfg", "x.yaml"], 123, 3, 8, "/tmp/rd", "rn",
                     "host0:999")
    assert cmd[3] == "host0:999"
    with pytest.raises(SystemExit):          # no training command
        main(["--nprocs", "1"])
    with pytest.raises(SystemExit):          # multi-node needs coordinator
        main(["--nprocs", "1", "--nnodes", "2", "--", "--cfg", "x.yaml"])
    with pytest.raises(SystemExit):          # multi-node needs a SHARED
        main(["--nprocs", "1", "--nnodes", "2",    # run dir (ADVICE r4:
              "--coordinator", "h0:1",             # per-node timestamps
              "--", "--cfg", "x.yaml"])            # desync orbax saves)


@pytest.mark.slow
def test_launch_two_procs_end_to_end(tmp_path):
    """2 ranks x 4 CPU devices run one smoke epoch through the real CLI
    path into ONE shared run dir: coordinated checkpoint, single-writer
    scalars/step-times, rank logs, rc 0."""
    run_dir = tmp_path / "run"
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "JAX_DEFAULT_MATMUL_PRECISION": "highest"})
    proc = subprocess.run(
        [sys.executable, "-m", "geot_tpu.engine.launch", "--nprocs", "2",
         "--devices-per-proc", "4", "--run-dir", str(run_dir), "--",
         "--cfg", "cfgs/tooth_semi/smoke.yaml", "batch_size_l=8",
         "batch_size_u=8", "epochs=1", "val_freq=1", "test_freq=999",
         "seed=3"],
        env=env, cwd=str(ROOT), timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert (run_dir / "rank0.log").exists() and (run_dir / "rank1.log").exists()
    # both ranks joined one 8-device runtime
    assert "mesh: dp=8" in (run_dir / "rank0.log").read_text()
    assert "2 host(s)" in (run_dir / "rank0.log").read_text()
    # single-writer artifacts, one coordinated checkpoint
    scalars = [json.loads(l) for l in (run_dir / "scalars.jsonl").open()]
    losses = [d for d in scalars if d["tag"] == "train_loss"]
    assert len(losses) == 1 and np.isfinite(losses[0]["value"])
    names = os.listdir(run_dir / "checkpoint")
    assert any(n.endswith("ckpt_latest") for n in names), names
    assert not [n for n in names if n.endswith((".tmp", ".old"))], names


def test_launch_failfast_kills_group(tmp_path):
    """A rank that dies immediately must take the group down with a nonzero
    exit instead of hanging the surviving rank on its next collective."""
    from geot_tpu.engine.launch import main

    # nonexistent cfg -> both ranks exit nonzero quickly; main returns != 0
    rc = main(["--nprocs", "2", "--devices-per-proc", "2",
               "--run-dir", str(tmp_path / "r"), "--",
               "--cfg", "cfgs/does_not_exist.yaml"])
    assert rc != 0


@pytest.mark.slow
def test_launch_multinode_simulated(tmp_path):
    """The --nnodes/--node-rank path: two 'nodes' (two launcher invocations
    on localhost, 1 rank each) join one coordinator into a single dp8 run —
    the real multi-node recipe, minus the second machine."""
    import socket
    import threading

    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    run_dir = tmp_path / "run"
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "JAX_DEFAULT_MATMUL_PRECISION": "highest"})

    def node(rank, out):
        out[rank] = subprocess.run(
            [sys.executable, "-m", "geot_tpu.engine.launch",
             "--nprocs", "1", "--nnodes", "2", "--node-rank", str(rank),
             "--coordinator", f"localhost:{port}",
             "--devices-per-proc", "4", "--run-dir", str(run_dir), "--",
             "--cfg", "cfgs/tooth_semi/smoke.yaml", "batch_size_l=8",
             "batch_size_u=8", "epochs=1", "val_freq=999", "test_freq=999",
             "seed=3"],
            env=env, cwd=str(ROOT), timeout=900,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    results = {}
    threads = [threading.Thread(target=node, args=(r, results))
               for r in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r in (0, 1):
        assert results[r].returncode == 0, results[r].stdout[-3000:]
    log0 = (run_dir / "rank0.log").read_text()
    assert "mesh: dp=8" in log0 and "2 host(s)" in log0
    assert any(n.endswith("ckpt_latest")
               for n in os.listdir(run_dir / "checkpoint"))
