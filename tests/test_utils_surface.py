"""Reference ``openpoints/utils/__init__.py`` + ``dataset/__init__.py``
public-surface parity: every exported name resolves from its documented
geot_tpu home, and the newly added members behave."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_reference_utils_exports_resolve():
    # reference utils/__init__.py name -> geot_tpu home
    from geot_tpu.core.random import set_random_seed            # noqa: F401
    from geot_tpu.core.config import EasyConfig, print_args     # noqa: F401
    from geot_tpu.core.logger import (setup_logger_dist,        # noqa: F401
                                      generate_exp_directory,
                                      resume_exp_directory)
    from geot_tpu.engine.writer import Wandb                    # noqa: F401
    from geot_tpu.core.metrics import (AverageMeter,            # noqa: F401
                                       ConfusionMatrix, get_mious,
                                       cal_model_parm_nums,
                                       cal_model_parm_nums_separate)
    from geot_tpu.engine.checkpoint import (                    # noqa: F401
        resume_model, resume_optimizer, resume_checkpoint, save_checkpoint,
        load_checkpoint, get_missing_parameters_message,
        get_unexpected_parameters_message)
    from geot_tpu.parallel import (find_free_port,              # noqa: F401
                                   get_dist_info)


def test_reference_dataset_exports_resolve():
    from geot_tpu.data import (crop_pc, get_class_weights,      # noqa: F401
                               get_features_by_keys, voxelize,
                               build_dataloader_from_cfg,
                               build_dataset_from_cfg,
                               build_semi_dataloader_from_cfg,
                               vis_multi_points, vis_points)


def test_print_args_collects_lines():
    from geot_tpu.core.config import EasyConfig, print_args

    lines = []
    print_args(EasyConfig({"a": 1, "b": "x"}), printer=lines.append)
    joined = "\n".join(lines)
    assert "a:1" in joined and "b:x" in joined


def test_cal_model_parm_nums_separate():
    from geot_tpu.core.metrics import cal_model_parm_nums_separate

    params = {"encoder": {"w": jnp.zeros((2, 3))},
              "decoder": {"w": jnp.zeros((4,))},
              "head": {"w": jnp.zeros((5,))}}
    total, enc, gen, dec = cal_model_parm_nums_separate(params)
    assert (total, enc, gen, dec) == (15, 6, 0, 4)


def test_parameter_message_grouping():
    from geot_tpu.engine.checkpoint import (
        get_missing_parameters_message, get_unexpected_parameters_message)

    msg = get_missing_parameters_message(["blocks.0.w", "blocks.0.b", "head"])
    assert "blocks.0.{w, b}" in msg and "head" in msg
    msg2 = get_unexpected_parameters_message(["extra.k"])
    assert "extra.k" in msg2 and "not used by the model" in msg2


def test_resume_model_and_optimizer_roundtrip(tmp_path):
    from geot_tpu.engine.checkpoint import (resume_model, resume_optimizer,
                                            save_checkpoint)
    from geot_tpu.engine.state import TrainState

    variables = {"params": {"w": jnp.ones((3,))}}
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState.create(variables, tx)
    # one step so the momentum buffer is non-trivial
    g = {"w": jnp.full((3,), 2.0)}
    upd, opt1 = tx.update(g, state.opt_state, state.params)
    state = state.replace(params=optax.apply_updates(state.params, upd),
                          opt_state=opt1, step=state.step + 1)
    cfg = {"ckpt_dir": str(tmp_path), "run_name": "t"}
    save_checkpoint(cfg, state, epoch=5, additional_dict={"miou": 0.5})

    fresh = TrainState.create(variables, tx)
    got, epoch, extra = resume_model(fresh, cfg)
    assert epoch == 5 and extra["miou"] == 0.5
    np.testing.assert_allclose(np.asarray(got.params["w"]),
                               np.asarray(state.params["w"]))
    # optimizer untouched by resume_model
    trace_fresh = np.asarray(
        jax.tree_util.tree_leaves(got.opt_state)[0], dtype=np.float64)

    got2, _, _ = resume_optimizer(fresh, cfg)
    t_saved = jax.tree_util.tree_flatten(state.opt_state)[0]
    t_rest = jax.tree_util.tree_flatten(got2.opt_state)[0]
    for a, b in zip(t_saved, t_rest):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    del trace_fresh

    # missing path: unchanged state, epoch 0 (reference semantics)
    same, epoch0, _ = resume_model(fresh, None,
                                   pretrained_path=str(tmp_path / "nope"))
    assert epoch0 == 0 and same is fresh


def test_optim_factory_helpers():
    from geot_tpu.optim.factory import (add_weight_decay, get_parameter_groups,
                                        optimizer_kwargs)

    params = {"dense": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros((4,))},
              "bn": {"scale": jnp.zeros((4,))}}
    mask = add_weight_decay(params, 1e-4)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False and mask["bn"]["scale"] is False
    groups = get_parameter_groups(params, weight_decay=0.05)
    assert set(groups) == {"decay", "no_decay"}
    assert groups["decay"]["weight_decay"] == 0.05
    assert "dense/kernel" in groups["decay"]["names"]
    kw = optimizer_kwargs({"opt": "sgd", "lr": 0.1, "weight_decay": 1e-4,
                           "momentum": 0.9, "opt_eps": 1e-8})
    assert kw["NAME"] == "sgd" and kw["eps"] == 1e-8 and kw["momentum"] == 0.9


def test_pointnet2_module_aliases():
    from geot_tpu.models.backbone.pointnetv2 import (
        PointnetSAModule, PointnetSAModuleMSG, PointnetFPModule,
        PointNetFeaturePropagation, PointNetSAModuleMSG, PointNetFPModule)

    assert PointnetSAModuleMSG is PointNetSAModuleMSG
    assert PointnetFPModule is PointNetFPModule
    assert PointNetFeaturePropagation is PointNetFPModule
    m = PointnetSAModule(mlp=[3, 16], radius=0.4, nsample=8, stride=2)
    xyz = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 3)),
                      jnp.float32)
    v = m.init(jax.random.PRNGKey(0), xyz, xyz)
    (q, f), _ = m.apply(v, xyz, xyz, training=True, mutable=["batch_stats"])
    assert q.shape == (2, 16, 3) and f.shape[1] == 16
    with pytest.raises(ValueError):
        PointnetSAModule(mlp=[3, 16], radius=0.4, nsample=8, npoint=512)


def test_pointmlp_helpers():
    from geot_tpu.models.backbone.pointmlp import (ConvBNReLU, ConvBNReLU1D,
                                                   get_activation,
                                                   query_ball_point)

    assert ConvBNReLU1D is ConvBNReLU
    act = get_activation("LeakyReLU0.2")
    np.testing.assert_allclose(float(act(jnp.asarray(-1.0))), -0.2, rtol=1e-6)
    xyz = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 3)),
                      jnp.float32)
    idx = query_ball_point(0.5, 8, xyz, xyz[:, :16])
    assert idx.shape == (1, 16, 8)
