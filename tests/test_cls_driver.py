"""End-to-end classification driver (``engine/cls.py``): the heritage cls
task the reference carries models/datasets for (``cls_base.py``,
``scanobjectnn.py``) trains through the real engine on the synthetic
fallback."""
import pathlib
import pytest

import numpy as np

from geot_tpu.core.config import EasyConfig

ROOT = pathlib.Path(__file__).resolve().parents[1]

TINY = [
    "epochs=1", "batch_size=8", "batch_size_val=8", "val_freq=1",
    "dataset.common.num_points=512",
    "model.encoder_args.width=8", "model.encoder_args.num_samples=8",
    "model.encoder_args.strides=[4,4]", "model.encoder_args.blocks=[1,1]",
    "model.cls_args.mlps=[32]",
    "seed=0",
]


def _cfg(run_dir=None):
    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs/scanobjectnn/pointnet2cls.yaml"), recursive=True)
    cfg.update(list(TINY))
    if run_dir:
        cfg.run_dir = str(run_dir)
        cfg.ckpt_dir = str(run_dir / "checkpoint")
        cfg.run_name = "t"
    return cfg


@pytest.mark.slow
def test_cls_e2e_synthetic(tmp_path):
    from geot_tpu.engine.cls import main

    out = main(_cfg(run_dir=tmp_path))
    best = out["best"]
    assert np.isfinite(best["oa"]) and 0.0 <= best["oa"] <= 100.0
    assert np.isfinite(best["macc"]) and 0.0 <= best["macc"] <= 100.0
    assert best["epoch"] == 1
    assert (tmp_path / "checkpoint" / "t_ckpt_best").is_dir()


@pytest.mark.slow
def test_cls_resume(tmp_path):
    """mode=resume restores state + epoch and continues to cfg.epochs."""
    from geot_tpu.engine.cls import main

    main(_cfg(run_dir=tmp_path))                       # epoch 1
    cfg = _cfg(run_dir=tmp_path)
    cfg.update(["epochs=2", "mode=resume",
                f"pretrained_path={tmp_path}/checkpoint/t_ckpt_latest"])
    out = main(cfg)
    assert out["best"]["epoch"] in (1, 2)
    assert np.isfinite(out["best"]["oa"])


def test_cls_eval_counts():
    """OA/mAcc bookkeeping against a hand-built case: a fake eval_step that
    always predicts class 0."""
    from geot_tpu.engine.cls import evaluate

    class Loader(list):
        dataset = ()

    loader = Loader([{
        "pos": np.zeros((4, 16, 3), np.float32),
        "x": np.zeros((4, 16, 4), np.float32),
        "y": np.array([0, 0, 1, 2]),
    }])
    import jax.numpy as jnp

    def fake_step(variables, batch):
        return jnp.tile(jnp.asarray([[10.0, 0.0, 0.0]]), (4, 1))

    m = evaluate(fake_step, {}, loader, {"num_classes": 3})
    # 2 of 4 correct overall; per-class acc = [1, 0, 0]
    assert abs(m["oa"] - 50.0) < 1e-6
    assert abs(m["macc"] - 100.0 / 3) < 1e-6



CLS_TINY = {
    "pointnet2cls.yaml": [
        "model.encoder_args.width=8", "model.encoder_args.num_samples=8",
        "model.encoder_args.strides=[4,4]", "model.encoder_args.blocks=[1,1]",
        "model.cls_args.mlps=[32]",
    ],
    "dgcnncls.yaml": [
        "model.encoder_args.channels=8", "model.encoder_args.embed_dim=32",
        "model.encoder_args.n_blocks=3", "model.encoder_args.k=8",
        "model.cls_args.mlps=[32]",
    ],
    "pointmlpcls.yaml": [
        "model.encoder_args.embed_dim=8",
        "model.encoder_args.dim_expansion=[2,2]",
        "model.encoder_args.pre_blocks=[1,1]",
        "model.encoder_args.pos_blocks=[1,1]",
        "model.encoder_args.k_neighbors=[8,8]",
        "model.encoder_args.reducers=[4,4]",
        "model.cls_args.mlps=[32]",
    ],
}


@pytest.mark.parametrize("cfg_name", sorted(CLS_TINY))
@pytest.mark.slow
def test_cls_config_steps(cfg_name):
    """Every cls-zoo config jits one supervised step + eval through the
    engine (tiny shrink overrides, synthetic data)."""
    import jax
    import jax.numpy as jnp

    from geot_tpu.engine.cls import _batch, evaluate
    from geot_tpu.engine.state import TrainState
    from geot_tpu.engine.steps import make_eval_step, make_supervised_step
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.models import build_model_from_cfg
    from geot_tpu.optim import build_optimizer_from_cfg

    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs/scanobjectnn" / cfg_name), recursive=True)
    cfg.update(CLS_TINY[cfg_name]
               + ["dataset.common.num_points=256", "seed=0"])
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="test")
    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(0)
    batch = _batch(next(iter(loader)), jax.device_put)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, batch)
    tx = build_optimizer_from_cfg(None, lr=1e-3, **cfg.optimizer)
    state = TrainState.create(variables, tx)
    step = make_supervised_step(model, tx, cfg)
    state, metrics = step(state, batch, jnp.asarray(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    m = evaluate(make_eval_step(model), state.variables, loader, cfg)
    assert np.isfinite(m["oa"]) and np.isfinite(m["macc"])


def test_cls_cli_dispatch():
    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs/scanobjectnn/default.yaml"), recursive=True)
    assert cfg.task == "cls"
    import inspect

    from geot_tpu.engine import train as train_mod

    assert '"cls"' in inspect.getsource(train_mod.parse_and_run)
