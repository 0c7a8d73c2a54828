"""skip_nonfinite_updates: a non-finite loss/gradient skips the WHOLE update
(weights, optimizers, batch stats, EMA side-state) instead of poisoning the
run — production hardening beyond the reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geot_tpu.core.config import EasyConfig
from geot_tpu.engine.state import SemiTrainState, TrainState
from geot_tpu.engine.steps import make_semi_step, make_supervised_step
from geot_tpu.models import build_model_from_cfg
from geot_tpu.optim import build_optimizer_from_cfg

SEG = dict(NAME="PointTransformer_seg_T", trans_dim=48, depth=3, num_heads=4,
           group_size=8, num_group=16, encoder_dims=32, nclasses=17,
           drop_path_rate=0.0, downsample_targets=[64, 32, 16],
           extract_layers=[1, 2, 3])


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _batch_l(b=1, n=128, poison=False):
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((b, n, 3)).astype(np.float32)
    if poison:
        pos[0, 0, 0] = np.inf
    pos = jnp.asarray(pos)
    return {"pos": pos, "x": pos, "cls": jnp.zeros((b, 1), jnp.int32),
            "y": jnp.asarray(rng.integers(0, 17, (b, n)), jnp.int32),
            "class_weights": jnp.full((b, 17), 1 / 17, jnp.float32)}


def _batch_u(b=1, n=128, poison=False):
    rng = np.random.default_rng(1)
    pw = rng.standard_normal((b, n, 3)).astype(np.float32)
    ps = rng.standard_normal((b, n, 3)).astype(np.float32)
    if poison:
        ps[0, 0, 0] = np.inf
    pw, ps = jnp.asarray(pw), jnp.asarray(ps)
    return {"pos_w": pw, "x_w": pw, "cls_w": jnp.zeros((b, 1), jnp.int32),
            "pos_s": ps, "x_s": ps, "cls_s": jnp.zeros((b, 1), jnp.int32),
            "raw_pos": pw, "y": jnp.zeros((b, n), jnp.int32)}


@pytest.mark.slow
def test_supervised_step_skips_nonfinite():
    cfg = EasyConfig({"criterion_args": {"NAME": "Poly1FocalLoss"},
                      "grad_norm_clip": 1.0, "seed": 0,
                      "skip_nonfinite_updates": True})
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": SEG})
    key = jax.random.PRNGKey(0)
    v = jax.jit(model.init)({"params": key,
                             "dropout": jax.random.fold_in(key, 1)},
                            _batch_l())
    tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    state = TrainState.create(v, tx)
    step = make_supervised_step(model, tx, cfg)

    before = _leaves(state.params)
    state, m = step(state, _batch_l(poison=True), jnp.float32(1e-3))
    assert float(m["skipped"]) == 1.0
    for a, b in zip(before, _leaves(state.params)):
        np.testing.assert_array_equal(a, b)
    assert int(state.step) == 1  # counter still advances

    state, m = step(state, _batch_l(), jnp.float32(1e-3))
    assert float(m["skipped"]) == 0.0 and np.isfinite(float(m["loss"]))
    changed = any(not np.array_equal(a, b)
                  for a, b in zip(before, _leaves(state.params)))
    assert changed, "finite batch must update the params"


@pytest.mark.slow
def test_semi_step_skips_nonfinite():
    cfg = EasyConfig({"criterion_args": {"NAME": "Poly1FocalLoss"},
                      "criterion_u_args": {"NAME": "Poly1FocalLoss_U_corr"},
                      "num_classes": 17, "grad_norm_clip": 1.0,
                      "threshold": 0.0, "unsupervised_loss_weight": 1.0,
                      "lambma": 0.9, "geo_lambma": 0.999, "ema_t_decay": 0.999,
                      "use_3d_loss": True, "threed_k": 8, "threed_sigma": 1.0,
                      "threed_loss_weight": 0.1, "batch_size_l": 1,
                      "batch_size_u": 1, "seed": 0,
                      "skip_nonfinite_updates": True})
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": SEG})
    t_pred = build_model_from_cfg(
        {"NAME": "Ins_T_mean", "T_args": {"NAME": "sig_t_mean",
                                          "nclasses": 17}})
    key = jax.random.PRNGKey(0)
    v = jax.jit(model.init)({"params": key,
                             "dropout": jax.random.fold_in(key, 1)},
                            _batch_l())
    t_vars = t_pred.init(jax.random.fold_in(key, 2),
                         jnp.full((1, 8, 17), 1 / 17), jnp.eye(17))
    tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    t_tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    state = SemiTrainState.create(v, tx, t_vars, t_tx, 17,
                                  jax.random.fold_in(key, 3),
                                  contrast_dim=SEG["trans_dim"])
    step = make_semi_step(model, model, t_pred, tx, t_tx, cfg)

    before_p = _leaves(state.params)
    before_ema = np.asarray(state.ema_t)
    state, m = step(state, _batch_l(), _batch_u(poison=True),
                    jnp.float32(1e-3), False)
    assert float(m["skipped"]) == 1.0
    for a, b in zip(before_p, _leaves(state.params)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(before_ema, np.asarray(state.ema_t))

    state, m = step(state, _batch_l(), _batch_u(), jnp.float32(1e-3), False)
    assert float(m["skipped"]) == 0.0 and np.isfinite(float(m["loss"]))
    assert not np.array_equal(before_ema, np.asarray(state.ema_t))
