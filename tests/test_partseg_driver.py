"""End-to-end ShapeNetPart driver (``engine/partseg.py``): the heritage
part-seg task the reference carries models/datasets/metrics for (openpoints
``shapenetpart.py``, ``base_seg.py:55``, ``train.py:76-106``) trains through
the real engine on the synthetic fallback."""
import pathlib

import numpy as np
import pytest

from geot_tpu.core.config import EasyConfig

ROOT = pathlib.Path(__file__).resolve().parents[1]

TINY = [
    "epochs=1", "batch_size=4", "batch_size_val=4", "val_freq=1",
    "dataset.common.num_points=512",
    "model.encoder_args.width=8", "model.encoder_args.num_samples=8",
    "model.encoder_args.strides=[4,4]", "model.encoder_args.blocks=[1,1]",
    "model.cls_args.mlps=[16]",
    "seed=0",
]


def _cfg(extra=(), run_dir=None):
    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs/shapenetpart/pointnet2part.yaml"),
             recursive=True)
    cfg.update(list(TINY) + list(extra))
    if run_dir:
        cfg.run_dir = str(run_dir)
        cfg.ckpt_dir = str(run_dir / "checkpoint")
        cfg.run_name = "t"
    return cfg


@pytest.mark.slow
def test_partseg_e2e_synthetic(tmp_path):
    from geot_tpu.engine.partseg import main

    out = main(_cfg(run_dir=tmp_path))
    best = out["best"]
    assert np.isfinite(best["ins_miou"]) and 0.0 <= best["ins_miou"] <= 100.0
    assert best["epoch"] == 1
    assert (tmp_path / "checkpoint" / "t_ckpt_best").is_dir()
    assert (tmp_path / "scalars.jsonl").exists()


@pytest.mark.slow
def test_partseg_resume(tmp_path):
    """mode=resume restores state + epoch and continues to cfg.epochs."""
    from geot_tpu.engine.partseg import main

    main(_cfg(run_dir=tmp_path))                       # epoch 1
    cfg = _cfg(["epochs=2", "mode=resume",
                f"pretrained_path={tmp_path}/checkpoint/t_ckpt_latest"],
               run_dir=tmp_path)
    out = main(cfg)
    assert out["best"]["epoch"] in (1, 2)              # best carried or beaten
    assert np.isfinite(out["best"]["ins_miou"])


def test_partseg_eval_category_mask(tmp_path):
    """With the category mask on, every prediction lands in the shape's own
    part range, so per-shape ins_miou can only improve or tie vs unmasked."""
    import jax

    from geot_tpu.engine.partseg import _batch, _part_mask, evaluate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.engine.state import TrainState
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.models import build_model_from_cfg
    from geot_tpu.optim import build_optimizer_from_cfg

    cfg = _cfg()
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="test")
    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(0)
    sample = _batch(next(iter(loader)), jax.device_put)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, sample)
    eval_step = make_eval_step(model)

    cfg.eval_category_mask = False
    plain = evaluate(eval_step, variables, loader, cfg)
    cfg.eval_category_mask = True
    masked = evaluate(eval_step, variables, loader, cfg)
    assert np.isfinite(plain["ins_miou"]) and np.isfinite(masked["ins_miou"])
    # untrained logits are near-uniform: masking to the true category's parts
    # is a strict improvement there
    assert masked["ins_miou"] >= plain["ins_miou"]
    # the mask table itself: exactly the cls2parts membership
    m = _part_mask(50)
    from geot_tpu.data.shapenetpart import SHAPENETPART_CLS2PARTS
    for c, parts in enumerate(SHAPENETPART_CLS2PARTS):
        assert set(np.where(np.isfinite(m[c]))[0].tolist()) == set(parts)


def test_partseg_eval_h5_variant(tmp_path):
    """The h5 ``ShapeNetPart`` dataset emits no ``cls`` key (category rides
    as a one-hot feature); eval recovers the category from the features."""
    import jax

    from geot_tpu.engine.partseg import _batch, evaluate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.models import build_model_from_cfg

    cfg = _cfg(["dataset.common.NAME=ShapeNetPart",
                "model.encoder_args.in_channels=16",
                "dataset.common.num_points=512"])
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="test")
    batch = next(iter(loader))
    assert "cls" not in batch
    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        _batch(batch, jax.device_put))
    m = evaluate(make_eval_step(model), variables, loader, cfg)
    assert np.isfinite(m["ins_miou"])


def test_partseg_eval_multihead(tmp_path):
    """multihead datasets (per-category label offsets) score through
    get_ins_mious(multihead=True); global-id mask/refine are auto-disabled."""
    import jax

    from geot_tpu.engine.partseg import _batch, evaluate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.models import build_model_from_cfg

    cfg = _cfg(["dataset.common.multihead=True",
                "eval_category_mask=True", "eval_refine=True"])
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="test")
    batch = next(iter(loader))
    # offsets applied: every label < its category's part count (max 6)
    assert np.asarray(batch["y"]).max() < 6
    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        _batch(batch, jax.device_put))
    m = evaluate(make_eval_step(model), variables, loader, cfg)
    assert np.isfinite(m["ins_miou"])


@pytest.mark.slow
def test_partseg_pointmlp_config_steps():
    """The PointMLP part-seg config jits one supervised step + eval through
    the engine (tiny shrink overrides, synthetic data)."""
    import jax
    import jax.numpy as jnp

    from geot_tpu.engine.partseg import _batch, evaluate
    from geot_tpu.engine.state import TrainState
    from geot_tpu.engine.steps import make_eval_step, make_supervised_step
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.models import build_model_from_cfg
    from geot_tpu.optim import build_optimizer_from_cfg

    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs/shapenetpart/pointmlppart.yaml"),
             recursive=True)
    cfg.update([
        "dataset.common.num_points=256", "model.embed_dim=8",
        "model.dim_expansion=[2,2]", "model.pre_blocks=[1,1]",
        "model.pos_blocks=[1,1]", "model.k_neighbors=[8,8]",
        "model.reducers=[4,4]", "model.de_dims=[16,16]",
        "model.de_blocks=[1,1]", "model.gmp_dim=8", "model.cls_dim=8",
        "seed=0",
    ])
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="trainval")
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
    assert np.isfinite(m["ins_miou"])


def test_partseg_cli_dispatch():
    """``task: partseg`` routes the train CLI to the partseg driver."""
    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs/shapenetpart/default.yaml"), recursive=True)
    assert cfg.task == "partseg"
    import inspect

    from geot_tpu.engine import train as train_mod

    src = inspect.getsource(train_mod.parse_and_run)
    assert "partseg" in src


def test_trainval_is_training_split():
    """ADVICE r3 (high): the configured training split is a training split —
    'trainval' gets shuffle/drop_last/train transforms, not the val pipeline
    (taskloop passes is_train=True; bare name inference also covers it)."""
    from geot_tpu.data import build_dataloader_from_cfg

    cfg = _cfg()
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="trainval")
    assert loader.shuffle and loader.drop_last
    # explicit override wins in both directions
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="trainval",
                                       is_train=False)
    assert not loader.shuffle and not loader.drop_last
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="test",
                                       is_train=True)
    assert loader.shuffle and loader.drop_last
    # shuffled loaders reorder across epochs (identical batches every epoch
    # was the original bug)
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="trainval")
    loader.set_epoch(1)
    a = loader._epoch_indices().tolist()
    loader.set_epoch(2)
    b = loader._epoch_indices().tolist()
    assert a != b and sorted(a) == sorted(b)


def test_eval_mode_requires_pretrained(tmp_path):
    """ADVICE r3 (medium): eval modes refuse to score a freshly initialized
    model when pretrained_path is missing."""
    import pytest

    from geot_tpu.engine.partseg import main

    with pytest.raises(FileNotFoundError, match="pretrained_path"):
        main(_cfg(["mode=test"]))


def test_multihead_per_split_detection(tmp_path):
    """ADVICE r3 (low): dataset.test.multihead=True (per-split) is honoured
    by eval, same precedence as build_dataloader_from_cfg."""
    import jax

    from geot_tpu.engine.partseg import _batch, evaluate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.models import build_model_from_cfg

    cfg = _cfg(["dataset.test.multihead=True"])
    loader = build_dataloader_from_cfg(4, cfg.dataset, split="test")
    batch = next(iter(loader))
    assert np.asarray(batch["y"]).max() < 6      # offsets applied
    model = build_model_from_cfg(cfg.model)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        _batch(batch, jax.device_put))
    m = evaluate(make_eval_step(model), variables, loader, cfg)
    assert np.isfinite(m["ins_miou"])
