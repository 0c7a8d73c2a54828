"""Gradient-flow smoke across the non-GeoT model families.

The GeoT training path (Point Transformer seg + NTM) is grad-covered by the
engine tests, and ViewGenBase by test_generation.py; this closes the gap for
the cls / variable-seg wrappers a pretraining or heritage user would
differentiate through (reference classification/cls_base.py:13,47,
models/segmentation heads).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.models import build_model_from_cfg

B, N = 2, 128


@pytest.fixture
def pos(rng):
    return jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))


def _grad_norm(model, variables, batch):
    def loss_fn(params):
        out = model.apply({"params": params, **{k: v for k, v in
                           variables.items() if k != "params"}}, batch)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves
                   if jnp.issubdtype(x.dtype, jnp.floating))

    g = jax.grad(loss_fn)(variables["params"])
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(x).all() for x in leaves)
    return sum(float(np.abs(x).sum()) for x in leaves)


def _init(model, *args):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, *args)


@pytest.mark.slow
def test_base_cls_grads(pos):
    m = build_model_from_cfg({
        "NAME": "BaseCls",
        "encoder_args": {"NAME": "DGCNN", "channels": 8, "embed_dim": 16,
                         "n_blocks": 3, "k": 8},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15, "mlps": [32, 16]}})
    batch = {"pos": pos, "x": pos}
    assert _grad_norm(m, _init(m, batch), batch) > 0


def test_distill_cls_grads(pos):
    m = build_model_from_cfg({
        "NAME": "DistillCls",
        "encoder_args": {"NAME": "PointMLPEncoder", "embed_dim": 8,
                         "dim_expansion": [2], "pre_blocks": [1],
                         "pos_blocks": [1], "k_neighbors": [8],
                         "reducers": [2]},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15, "mlps": [16]}})
    assert _grad_norm(m, _init(m, pos), pos) > 0


@pytest.mark.slow
def test_variable_seg_grads(pos):
    m = build_model_from_cfg({
        "NAME": "VariableSeg",
        "encoder_args": {"NAME": "PointNet2Encoder", "in_channels": 3,
                         "width": 8, "layers": 2, "strides": [4, 4],
                         "radius": 0.2, "num_samples": 8, "blocks": [1, 1],
                         "aggr_args": {"feature_type": "dp_fj"}},
        "decoder_args": {"NAME": "PointNet2Decoder"},
        "cls_args": {"NAME": "VariableSegHead", "num_classes": 17,
                     "in_channels": 16}})
    batch = {"pos": pos, "x": pos}
    assert _grad_norm(m, _init(m, batch), batch) > 0
