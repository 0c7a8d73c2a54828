"""Loop-level tests (SURVEY.md §4 item 3): NTM machinery units + a full
2-epoch semi-supervised smoke run on synthetic data."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.core.config import EasyConfig
from geot_tpu.engine.semi import (LABEL_PROJ, combine_T, apply_T,
                                  estimate_class_T, gaussian_prior_T,
                                  ntm_update, pseudo_stats)

C = 17


class TestNTM:
    def test_estimate_class_T_picks_anchor_rows(self, rng):
        probs = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((2, 32, C)).astype(np.float32)), -1)
        T = np.asarray(estimate_class_T(probs))
        flat = np.asarray(probs).reshape(-1, C)
        for c in range(C):
            np.testing.assert_allclose(T[c], flat[flat[:, c].argmax()], atol=1e-6)

    def test_gaussian_prior_structure(self):
        sigma = jnp.full((C,), 0.4)
        prior = np.asarray(gaussian_prior_T(sigma))
        np.testing.assert_allclose(prior.sum(1), 1.0, atol=1e-5)
        assert prior[0, 0] == pytest.approx(1.0)
        assert (prior[1:, 0] == 0).all()
        # neighbouring teeth in LABEL_PROJ order get higher prior than distant
        assert prior[1, 2] > prior[1, 8]

    def test_ntm_update_rows_normalised(self, rng):
        probs = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((2, 64, C)).astype(np.float32)), -1)
        out = ntm_update(jnp.eye(C), probs, jnp.full((C,), 0.4))
        np.testing.assert_allclose(np.asarray(out.ema_t).sum(1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.ema_t_corr).sum(1), 1.0, atol=1e-5)

    def test_ema_close_to_identity_at_high_decay(self, rng):
        probs = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((1, 32, C)).astype(np.float32)), -1)
        out = ntm_update(jnp.eye(C), probs, jnp.full((C,), 0.4),
                         ema_t_decay=0.999)
        assert np.abs(np.asarray(out.ema_t) - np.eye(C)).max() < 0.01

    def test_sigma_gradient_flows_through_corr(self):
        probs = jax.nn.softmax(jnp.ones((1, 8, C)), -1)

        def f(sigma):
            return jnp.sum(ntm_update(jnp.eye(C), probs, sigma).ema_t_corr ** 2)

        g = jax.grad(f)(jnp.full((C,), 0.4))
        assert np.abs(np.asarray(g)).sum() > 0

    def test_combine_and_apply(self, rng):
        ema = jnp.eye(C)
        ins = jnp.broadcast_to(jnp.eye(C), (8, C, C))
        newT = combine_T(ema, ins, 0.9)
        np.testing.assert_allclose(np.asarray(newT).sum(-1), 1.0, atol=1e-5)
        logits = jnp.asarray(rng.standard_normal((1, 8, C)).astype(np.float32))
        out = apply_T(logits, newT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(logits), atol=1e-5)

    def test_pseudo_stats_perfect_labels(self):
        y = jnp.asarray(np.arange(32).reshape(1, 32) % C)
        stats = pseudo_stats(y, y, jnp.ones((1, 32)), 0.5, C)
        assert float(stats["pseudo_acc"]) == pytest.approx(100.0)
        assert float(stats["over_th"]) == pytest.approx(100.0)


class TestSmokeTrain:
    @pytest.mark.slow
    def test_two_epoch_semi_run(self, tmp_path):
        from geot_tpu.engine.train import main

        cfg = EasyConfig()
        cfg.load(os.path.join(os.path.dirname(__file__), "..",
                              "cfgs", "tooth_semi", "smoke.yaml"), recursive=True)
        cfg.run_dir = str(tmp_path / "run")
        cfg.ckpt_dir = str(tmp_path / "run" / "checkpoint")
        cfg.run_name = "smoke"
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        results = main(cfg)
        assert "val" in results
        assert np.isfinite(results["val"]["whole_acc"])
        # checkpoint written
        assert any("ckpt" in d for d in os.listdir(cfg.ckpt_dir))
        # scalars logged
        assert (tmp_path / "run" / "scalars.jsonl").exists()


class TestResume:
    @pytest.mark.slow
    def test_mode_resume_continues_from_checkpoint(self, tmp_path):
        """Reference ``mode=resume`` (``ckpt_util.py:111``): a second main()
        with mode=resume restores the state pytree + epoch and continues."""
        from geot_tpu.engine.train import main

        cfg = EasyConfig()
        cfg.load(os.path.join(os.path.dirname(__file__), "..",
                              "cfgs", "tooth_semi", "smoke.yaml"),
                 recursive=True)
        cfg.run_dir = str(tmp_path / "run")
        cfg.ckpt_dir = str(tmp_path / "run" / "checkpoint")
        cfg.run_name = "resume_smoke"
        cfg.epochs = 2
        cfg.val_freq = 2
        cfg.test_freq = 999
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        main(cfg)
        latest = [d for d in os.listdir(cfg.ckpt_dir) if "latest" in d]
        assert latest, "checkpoint must exist after the first run"

        cfg2 = EasyConfig()
        cfg2.load(os.path.join(os.path.dirname(__file__), "..",
                               "cfgs", "tooth_semi", "smoke.yaml"),
                  recursive=True)
        cfg2.run_dir = cfg.run_dir
        cfg2.ckpt_dir = cfg.ckpt_dir
        cfg2.run_name = cfg.run_name
        cfg2.val_freq = 2
        cfg2.test_freq = 999
        cfg2.mode = "resume"
        cfg2.pretrained_path = os.path.join(cfg.ckpt_dir, latest[0])
        cfg2.epochs = 4
        results = main(cfg2)
        assert "val" in results and np.isfinite(results["val"]["whole_acc"])

    @pytest.mark.slow
    def test_resume_trajectory_matches_uninterrupted(self, tmp_path):
        """2 epochs + resume for 2 more must reproduce the straight 4-epoch
        run: data rng is (seed, epoch, idx)-keyed and step rngs fold from
        state.step, so restoring the pytree restores the trajectory."""
        from geot_tpu.engine.train import main

        def base_cfg(run):
            cfg = EasyConfig()
            cfg.load(os.path.join(os.path.dirname(__file__), "..",
                                  "cfgs", "tooth_semi", "smoke.yaml"),
                     recursive=True)
            cfg.run_dir = str(tmp_path / run)
            cfg.ckpt_dir = str(tmp_path / run / "checkpoint")
            cfg.run_name = run
            cfg.val_freq = 999
            cfg.test_freq = 999
            cfg.seed = 11
            os.makedirs(cfg.ckpt_dir, exist_ok=True)
            return cfg

        def losses_of(run_dir):
            import json
            out = {}
            for line in open(os.path.join(run_dir, "scalars.jsonl")):
                d = json.loads(line)
                if d["tag"] == "train_loss":
                    out[d["step"]] = d["value"]
            return out

        cfg = base_cfg("straight")
        cfg.epochs = 4
        cfg.save_freq = 2
        main(cfg)
        straight = losses_of(cfg.run_dir)

        cfg1 = base_cfg("interrupted")
        cfg1.epochs = 2
        main(cfg1)
        latest = [d for d in os.listdir(cfg1.ckpt_dir) if "latest" in d][0]
        cfg2 = base_cfg("interrupted")
        cfg2.mode = "resume"
        cfg2.pretrained_path = os.path.join(cfg1.ckpt_dir, latest)
        cfg2.epochs = 4
        main(cfg2)
        resumed = losses_of(cfg2.run_dir)

        assert resumed[4] == pytest.approx(straight[4], rel=1e-5), \
            f"epoch-4 loss diverged: {resumed[4]} vs {straight[4]}"


def test_device_prefetch_preserves_order_and_coverage():
    """The background-upload pipeline must yield every item, transformed, in
    order — even when the transform is slower than consumption."""
    import time as _time

    from geot_tpu.engine.train import device_prefetch

    def slow_put(x):
        _time.sleep(0.002)
        return x * 10

    out = list(device_prefetch(iter(range(20)), slow_put, depth=3))
    assert out == [i * 10 for i in range(20)]
    # depth=0: fully synchronous fallback (GEOT_PREFETCH_DEPTH=0 A/B mode)
    assert list(device_prefetch(iter(range(5)), slow_put, depth=0)) == \
        [i * 10 for i in range(5)]
    # empty iterator: no hang, no items
    assert list(device_prefetch(iter(()), slow_put)) == []


class TestProfileEpoch:
    @pytest.mark.slow
    def test_profile_epoch_writes_trace(self, tmp_path):
        """`profile_epoch: N` captures a device trace of epoch N into
        <run_dir>/trace (observability beyond the reference)."""
        from geot_tpu.engine.train import main

        cfg = EasyConfig()
        cfg.load(os.path.join(os.path.dirname(__file__), "..",
                              "cfgs", "tooth_semi", "smoke.yaml"),
                 recursive=True)
        cfg.run_dir = str(tmp_path / "run")
        cfg.ckpt_dir = str(tmp_path / "run" / "checkpoint")
        cfg.run_name = "smoke_profile"
        cfg.profile_epoch = 1
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        main(cfg)
        trace_dir = tmp_path / "run" / "trace"
        assert trace_dir.is_dir()
        files = [p for p in trace_dir.rglob("*") if p.is_file()]
        assert files, "profile_epoch must write trace files"
