"""Optimizer/scheduler factories, checkpoint round-trip, mesh sharding."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from geot_tpu.optim import build_optimizer_from_cfg, build_scheduler_from_cfg
from geot_tpu.optim.factory import _OPTIMIZERS


class TestOptim:
    def test_all_registered_optimizers_step(self, rng):
        params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        for name in sorted(set(_OPTIMIZERS)):
            tx = build_optimizer_from_cfg(None, lr=1e-2, NAME=name)
            state = tx.init(params)
            extra = {}
            if name == "adahessian":   # second-order: needs the diag pytree
                extra["hessian_diag"] = grads
            updates, _ = tx.update(grads, state, params, **extra)
            new = optax.apply_updates(params, updates)
            assert not np.allclose(np.asarray(new["dense"]["kernel"]),
                                   np.asarray(params["dense"]["kernel"])), name

    def test_weight_decay_skips_bias(self):
        params = {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
        tx = build_optimizer_from_cfg(None, lr=0.0, NAME="adamw",
                                      weight_decay=0.1)
        # lr=0 -> pure decay contribution; inject_hyperparams still applies lr
        # so use lr>0 and zero grads instead
        tx = build_optimizer_from_cfg(None, lr=1.0, NAME="adamw",
                                      weight_decay=0.1)
        state = tx.init(params)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        updates, _ = tx.update(zeros, state, params)
        assert float(jnp.abs(updates["kernel"]).sum()) > 0   # decayed
        assert float(jnp.abs(updates["bias"]).sum()) == 0    # not decayed

    def test_lr_injection(self):
        params = {"w": jnp.ones((2, 2))}
        tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="sgd", momentum=0.0)
        state = tx.init(params)
        state.hyperparams["lr_value"] = jnp.asarray(0.5)
        updates, _ = tx.update({"w": jnp.ones((2, 2))}, state, params)
        np.testing.assert_allclose(np.asarray(updates["w"]), -0.5, atol=1e-6)


class TestExtraOptimizers:
    """The timm-set optimizers optax lacks (optim/extra.py): adamp, sgdp,
    madgrad, lookahead, rmsprop_tf."""

    def _params(self):
        return {"kernel": jnp.full((4, 4), 0.5), "bias": jnp.full((4,), 0.5)}

    def test_adamp_first_step_is_lr_sized(self):
        # with constant grads the first AdamP step is ~lr (adam-like), and
        # bias (rank-1) gets no weight decay under filtering
        params = self._params()
        tx = build_optimizer_from_cfg(None, lr=0.1, NAME="adamp",
                                      weight_decay=0.5)
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        up, _ = tx.update(g, state, params)
        assert abs(float(up["bias"][0]) + 0.1) < 1e-3         # no decay term
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        up0, _ = tx.update(zeros, tx.init(params), params)
        assert float(jnp.abs(up0["bias"]).sum()) == 0          # bias undecayed
        assert float(jnp.abs(up0["kernel"]).sum()) > 0         # kernel decayed

    def test_adamp_projection_removes_radial_component(self):
        # gradient orthogonal to the weight triggers the projection: the
        # update must stay orthogonal to the weight direction
        p = {"w": jnp.asarray([[1.0, 0.0], [1.0, 0.0]])}
        g = {"w": jnp.asarray([[0.0, 1.0], [0.0, -1.0]])}      # ⟂ to w
        from geot_tpu.optim.extra import adamp
        tx = adamp(0.1, weight_decay=0.0)
        up, _ = tx.update(g, tx.init(p), p)
        radial = float(jnp.sum(up["w"] * p["w"]))
        assert abs(radial) < 1e-6

    def test_madgrad_moves_against_gradient(self):
        params = self._params()
        tx = build_optimizer_from_cfg(None, lr=0.1, NAME="madgrad")
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        new = dict(params)
        for _ in range(3):
            up, state = tx.update(g, state, new)
            new = optax.apply_updates(new, up)
        assert float(new["kernel"][0, 0]) < float(params["kernel"][0, 0])

    def test_lookahead_sync_every_k(self):
        from geot_tpu.optim.extra import lookahead

        params = {"w": jnp.zeros((2,))}
        tx = lookahead(alpha=0.5, k=2)
        state = tx.init(params)
        u = {"w": jnp.full((2,), -1.0)}                        # fast step of -1
        # step 1: pass-through
        up1, state = tx.update(u, state, params)
        np.testing.assert_allclose(np.asarray(up1["w"]), -1.0)
        p1 = optax.apply_updates(params, up1)                  # w = -1
        # step 2 (sync): fast would be -2; slow 0 -> 0 + 0.5*(-2-0) = -1
        up2, state = tx.update(u, state, p1)
        p2 = optax.apply_updates(p1, up2)
        np.testing.assert_allclose(np.asarray(p2["w"]), -1.0, atol=1e-6)

    def test_lookahead_prefix_dispatch(self):
        params = self._params()
        tx = build_optimizer_from_cfg(None, lr=0.1, NAME="lookahead_sgd",
                                      momentum=0.0, lookahead_k=2)
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        up, _ = tx.update(g, state, params)
        np.testing.assert_allclose(np.asarray(up["kernel"]), -0.1, atol=1e-6)


class TestSchedulers:
    def test_multistep(self):
        s = build_scheduler_from_cfg({"sched": "multistep", "lr": 1.0,
                                      "decay_epochs": [10, 20],
                                      "decay_rate": 0.1, "epochs": 30})
        assert s(5) == 1.0 and s(10) == pytest.approx(0.1)
        assert s(25) == pytest.approx(0.01)

    def test_cosine_endpoints(self):
        # timm semantics (schedule(epoch) is the lr DURING 1-based epoch,
        # i.e. the timm value at t = epoch - 1); min_lr falsy -> lr/1000
        # like the reference factory (scheduler_factory.py:16)
        s = build_scheduler_from_cfg({"sched": "cosine", "lr": 1.0,
                                      "min_lr": 0.0, "epochs": 100})
        assert s(1) == pytest.approx(1.0)
        assert s(100) == pytest.approx(1e-3, abs=3e-4)
        assert 0.4 < s(51) < 0.6

    def test_warmup(self):
        s = build_scheduler_from_cfg({"sched": "cosine", "lr": 1.0,
                                      "epochs": 100, "warmup_epochs": 10,
                                      "warmup_lr": 0.0})
        assert s(1) == pytest.approx(0.0)
        assert s(6) == pytest.approx(0.5)
        assert s(11) == pytest.approx(0.9756, abs=1e-3)  # cos(pi*10/100), not warmup-prefixed

    def test_step_and_poly(self):
        st = build_scheduler_from_cfg({"sched": "step", "lr": 1.0,
                                       "decay_epochs": 10, "decay_rate": 0.5,
                                       "epochs": 40})
        assert st(26) == pytest.approx(0.25)
        p = build_scheduler_from_cfg({"sched": "poly", "lr": 1.0,
                                      "decay_rate": 1.0, "epochs": 10})
        assert p(6) == pytest.approx(0.5, abs=0.06)


class TestCheckpoint:
    def test_state_roundtrip(self, tmp_path):
        from geot_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
        from geot_tpu.engine.state import TrainState

        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
        state = TrainState.create({"params": params, "batch_stats": {}}, tx)
        cfg = {"ckpt_dir": str(tmp_path), "run_name": "t"}
        save_checkpoint(cfg, state, epoch=7, additional_dict={"miou": 0.5},
                        is_best=True)
        template = TrainState.create(
            {"params": jax.tree_util.tree_map(jnp.zeros_like, params),
             "batch_stats": {}}, tx)
        restored, epoch, extra = load_checkpoint(
            os.path.join(str(tmp_path), "t_ckpt_best"), template)
        assert epoch == 7 and extra["miou"] == 0.5
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.asarray(params["w"]))


class TestMesh:
    def test_dp_sharded_forward_matches_single(self, rng):
        from conftest import cpu_devices
        from geot_tpu.parallel import make_mesh, shard_batch

        devs = cpu_devices(8)
        mesh = make_mesh(devs, dp=4, tp=2)

        @jax.jit
        def f(x):
            return jnp.sum(x ** 2, axis=(1, 2))

        x = jnp.asarray(rng.standard_normal((8, 16, 4)).astype(np.float32))
        ref = f(x)
        xs = shard_batch({"x": x}, mesh)["x"]
        with mesh:
            out = f(xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_param_tp_rules(self):
        from geot_tpu.parallel.mesh import param_sharding_rules
        from jax.sharding import PartitionSpec as P

        k = jnp.ones((8, 8))
        # specs come back in canonical trailing-None-stripped form
        # (PartitionSpec equality does not strip them itself)
        assert param_sharding_rules("blocks/block_0/attn/qkv/kernel", k) == P(None, "tp")
        assert param_sharding_rules("blocks/block_0/attn/proj/kernel", k) == P("tp")
        assert param_sharding_rules("encoder/conv1a/kernel", k) == P()
        assert param_sharding_rules("norm/scale", jnp.ones((8,))) == P()
        # fsdp: big arrays get their largest free divisible axis dp-sharded
        big = jnp.ones((64, 1024))
        assert param_sharding_rules("encoder/dense/kernel", big,
                                    fsdp_dp=8) == P(None, "dp")
        assert param_sharding_rules("blocks/block_0/attn/qkv/kernel", big,
                                    fsdp_dp=8) == P("dp", "tp")
        # small arrays stay replicated under fsdp
        assert param_sharding_rules("norm/scale", jnp.ones((8,)),
                                    fsdp_dp=8) == P()


class TestGradAccumulation:
    def test_multisteps_accumulates(self):
        from geot_tpu.optim.factory import set_learning_rate

        params = {"w": jnp.zeros((2, 2))}
        tx = build_optimizer_from_cfg(None, lr=1.0, NAME="sgd", momentum=0.0,
                                      every_k=2)
        state = tx.init(params)
        g = {"w": jnp.ones((2, 2))}
        state = set_learning_rate(state, 1.0)
        up1, state = tx.update(g, state, params)
        # first micro-step: no update applied yet
        np.testing.assert_allclose(np.asarray(up1["w"]), 0.0)
        up2, state = tx.update(g, state, params)
        # second micro-step: mean of accumulated grads applied
        np.testing.assert_allclose(np.asarray(up2["w"]), -1.0, atol=1e-6)
