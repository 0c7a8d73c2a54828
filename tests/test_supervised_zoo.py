"""Generic supervised training path (beyond the reference: upstream's driver
only trains WholePartSeg/seg_T — ``examples/segmentation/train.py:154`` always
builds the semi machinery).  Every model-zoo config in ``cfgs/tooth_sup/``
must jit one supervised step + one eval step through the real engine code.
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geot_tpu.core.config import EasyConfig
from geot_tpu.engine.state import TrainState
from geot_tpu.engine.steps import make_eval_step, make_supervised_step
from geot_tpu.models import build_model_from_cfg
from geot_tpu.optim import build_optimizer_from_cfg

ROOT = pathlib.Path(__file__).resolve().parents[1]

# dotted-key shrink overrides (same EasyConfig.update path as the CLI)
TINY = {
    "pointnet2.yaml": [
        "model.encoder_args.width=8", "model.encoder_args.num_samples=8",
        "model.encoder_args.strides=[4,4]", "model.encoder_args.blocks=[1,1]",
        "model.cls_args.mlps=[16]",
    ],
    "dgcnn.yaml": [
        "model.encoder_args.channels=8", "model.encoder_args.embed_dim=32",
        "model.encoder_args.n_blocks=3", "model.encoder_args.k=8",
        "model.cls_args.mlps=[16]",
    ],
    "pointmlp.yaml": [
        "model.embed_dim=8", "model.dim_expansion=[2,2]",
        "model.pre_blocks=[1,1]", "model.pos_blocks=[1,1]",
        "model.k_neighbors=[8,8]", "model.reducers=[4,4]",
        "model.de_dims=[16,16]", "model.de_blocks=[1,1]",
        "model.gmp_dim=8", "model.cls_dim=8",
    ],
    "transformer.yaml": [
        "model.segmentor_args.trans_dim=48", "model.segmentor_args.depth=3",
        "model.segmentor_args.group_size=8", "model.segmentor_args.num_group=32",
        "model.segmentor_args.encoder_dims=32",
        "model.segmentor_args.downsample_targets=[128,64,32]",
        "model.segmentor_args.extract_layers=[1,2,3]",
    ],
}

N_PTS = 256


def _batch(rng, n=N_PTS, b=2):
    pos = rng.standard_normal((b, n, 3)).astype(np.float32)
    return {
        "pos": jnp.asarray(pos), "x": jnp.asarray(pos),
        "cls": jnp.zeros((b, 1), jnp.int32),
        "y": jnp.asarray(rng.integers(0, 17, (b, n)), jnp.int32),
        "class_weights": jnp.ones((b, 17), jnp.float32),
    }


@pytest.mark.parametrize("cfg_name", sorted(TINY))
@pytest.mark.slow
def test_zoo_config_trains_one_step(cfg_name):
    cfg = EasyConfig()
    cfg.load(str(ROOT / "cfgs" / "tooth_sup" / cfg_name), recursive=True)
    cfg.update(TINY[cfg_name])
    model = build_model_from_cfg(cfg.model)
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": jax.random.fold_in(key, 1)},
                           batch)
    tx = build_optimizer_from_cfg(None, lr=cfg.lr, **cfg.optimizer)
    state = TrainState.create(variables, tx)
    step = make_supervised_step(model, tx, cfg)

    losses = []
    for i in range(2):
        state, metrics = step(state, _batch(np.random.default_rng(i + 1)),
                              jnp.float32(cfg.lr))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), (cfg_name, losses)
    assert int(state.step) == 2

    logits = make_eval_step(model)(state.variables, _batch(rng))
    assert logits.shape == (2, N_PTS, 17)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
