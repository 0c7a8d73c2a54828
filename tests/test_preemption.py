"""Preemption safety: SIGTERM mid-training checkpoints and exits cleanly,
and the run continues with mode=resume (preemptible-pod semantics)."""
import os
import signal
import subprocess
import sys
import time

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CFG = os.path.join(ROOT, "cfgs", "tooth_semi", "smoke.yaml")


def _cpu_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
    out = open(tmp_path / "train.log", "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "geot_tpu.engine.train", "--cfg", CFG,
         "epochs=9999", "val_freq=1", "seed=5", f"root_dir={tmp_path}"],
        cwd=ROOT, env=_cpu_env(), stdout=out, stderr=subprocess.STDOUT)
    try:
        # wait until at least one epoch finished (so a checkpoint exists),
        # then preempt
        deadline = time.time() + 600
        logtxt = ""
        while time.time() < deadline:
            time.sleep(2)
            logtxt = open(tmp_path / "train.log").read()
            if "epoch 2/9999" in logtxt:
                break
            assert proc.poll() is None, f"train died early:\n{logtxt[-2000:]}"
        else:
            pytest.fail(f"never reached epoch 2:\n{logtxt[-2000:]}")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
        out.close()
    logtxt = open(tmp_path / "train.log").read()
    assert rc == 0, logtxt[-2000:]
    assert "preempted (signal 15)" in logtxt

    run_dirs = [d for d in os.listdir(tmp_path / "tooth_semi")
                if (tmp_path / "tooth_semi" / d).is_dir()]
    assert len(run_dirs) == 1
    run = tmp_path / "tooth_semi" / run_dirs[0]
    latest = [d for d in os.listdir(run / "checkpoint")
              if d.endswith("_ckpt_latest")]
    assert latest, "preemption must leave a resumable latest checkpoint"

    # resume continues past the preempted epoch and exits cleanly
    ep = int(logtxt.split("preempted (signal 15) at epoch ")[1].split(":")[0])
    res = subprocess.run(
        [sys.executable, "-m", "geot_tpu.engine.train", "--cfg", CFG,
         "mode=resume", f"pretrained_path={run / 'checkpoint' / latest[0]}",
         f"epochs={ep + 1}", "val_freq=1", "test_freq=1000", "seed=5",
         f"root_dir={tmp_path}"],
        cwd=ROOT, env=_cpu_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=900)
    txt = res.stdout.decode(errors="replace")
    assert res.returncode == 0, txt[-2000:]
    assert f"resumed from" in txt and f"epoch {ep + 1}/{ep + 1}" in txt
