"""TAP-style pretraining driver + encoder graft into the flagship
(stage-1 -> stage-2 of the GeoT method; reference ships datasets/models but
no driver — see ``engine/pretrain.py`` docstring).
"""
import os

import jax
import numpy as np
import pytest

from geot_tpu.core.config import EasyConfig

HERE = os.path.dirname(__file__)

TINY_PRETRAIN = [
    "model.encoder_args.trans_dim=48", "model.encoder_args.depth=3",
    "model.encoder_args.group_size=8", "model.encoder_args.num_group=32",
    "model.encoder_args.encoder_dims=32",
    "model.encoder_args.extract_layers=[1,2,3]",
    "model.generator_args.in_channels=48",
    "model.generator_args.feat_channels=48",
    "model.generator_args.depth=1",
    "model.generator_args.channels_per_head=16",
    "model.decoder_args.in_channels=48",
    "dataset.common.num_points=256", "dataset.common.img_size=128",
    "epochs=2", "val_freq=2", "dataloader.num_workers=0",
]


def _pretrain_cfg(tmp_path):
    cfg = EasyConfig()
    cfg.load(os.path.join(HERE, "..", "cfgs", "tooth_pretrain", "viewgen.yaml"),
             recursive=True)
    cfg.update(TINY_PRETRAIN)
    cfg.run_dir = str(tmp_path / "pt")
    cfg.ckpt_dir = str(tmp_path / "pt" / "checkpoint")
    cfg.run_name = "pt"
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    return cfg


@pytest.mark.slow
def test_pretrain_resume_missing_path_refuses(tmp_path):
    from geot_tpu.engine.pretrain import main as pretrain_main

    cfg = _pretrain_cfg(tmp_path)
    cfg.mode = "resume"
    cfg.pretrained_path = str(tmp_path / "gone")
    with pytest.raises(FileNotFoundError):
        pretrain_main(cfg)


@pytest.mark.slow
def test_pretrain_then_encoder_graft(tmp_path):
    from geot_tpu.engine.pretrain import main as pretrain_main

    cfg = _pretrain_cfg(tmp_path)
    results = pretrain_main(cfg)
    assert np.isfinite(results["val_loss"])
    best = [d for d in os.listdir(cfg.ckpt_dir) if d.endswith("best")]
    assert best
    ckpt = os.path.join(cfg.ckpt_dir, best[0])

    # ---- graft into the flagship (smoke-sized WholePartSeg) --------------
    from geot_tpu.engine.checkpoint import load_pretrain_encoder, load_variables
    from geot_tpu.models import build_model_from_cfg

    seg_cfg = EasyConfig()
    seg_cfg.load(os.path.join(HERE, "..", "cfgs", "tooth_semi", "smoke.yaml"),
                 recursive=True)
    model = build_model_from_cfg(seg_cfg.model)
    import jax.numpy as jnp
    pos = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 256, 3)).astype(np.float32))
    batch = {"pos": pos, "x": pos, "cls": jnp.zeros((2, 1), jnp.int32)}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, batch)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    grafted, skipped = load_pretrain_encoder(variables, ckpt)
    # the pretraining encoder trunk and the seg trunk share module names —
    # every pretrained trunk entry must land (nothing skipped)
    assert not skipped, skipped

    loaded = load_variables(ckpt)
    np.testing.assert_array_equal(
        grafted["params"]["segmentor"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"],
        loaded["params"]["encoder"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"])
    # non-trunk modules keep their fresh init
    for k in variables["params"]["segmentor"]:
        if k not in loaded["params"]["encoder"]:
            fresh_leaves = jax.tree_util.tree_leaves(
                variables["params"]["segmentor"][k])
            graft_leaves = jax.tree_util.tree_leaves(
                grafted["params"]["segmentor"][k])
            for a, b in zip(fresh_leaves, graft_leaves):
                np.testing.assert_array_equal(a, b)

    # grafted model still forwards
    out = model.apply(grafted, batch)
    assert np.isfinite(np.asarray(out[0], np.float32)).all()
