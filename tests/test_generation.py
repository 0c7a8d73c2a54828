"""Generation-stack tests (reference P20: TAP pretraining)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.models import build_model_from_cfg

IMG = 64
DS = 16
OUT = (IMG // DS) * 32  # decoder upsamples 32x from the feature grid


@pytest.mark.slow
def test_view_gen_end_to_end(rng):
    cfg = {
        "NAME": "ViewGenBase",
        "encoder_args": {
            "NAME": "PointTransformer_genencoder", "trans_dim": 48, "depth": 2,
            "num_heads": 4, "group_size": 8, "num_group": 32,
            "encoder_dims": 32, "extract_layers": [1, 2]},
        "generator_args": {
            "NAME": "ViewTransformer", "in_channels": 48, "feat_channels": 48,
            "depth": 1, "channels_per_head": 16, "drop_rate": 0.0,
            "obj_size": 56, "img_size": IMG, "img_ds_ratio": DS},
        "decoder_args": {"NAME": "ViewDecoder", "in_channels": 48,
                         "out_channels": 3},
        "loss_args": {"weight_fg": 1.0, "weight_bg": 0.1},
    }
    model = build_model_from_cfg(cfg)
    B, N, V = 2, 128, 2
    pos = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    views = jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3))
    imgs = jnp.asarray(rng.uniform(0, 1, (B, V, OUT, OUT, 3)).astype(np.float32))
    batch = {"pos": pos, "views": views, "imgs": imgs}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, batch)
    loss, recon = model.apply(variables, batch)
    assert np.isfinite(float(loss))
    assert recon.shape == (B * V, OUT, OUT, 3)
    assert (np.asarray(recon) >= 0).all() and (np.asarray(recon) <= 1).all()

    # gradients flow into the generator
    def loss_fn(params):
        l, _ = model.apply({"params": params,
                            "batch_stats": variables.get("batch_stats", {})}, batch)
        return l

    g = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0
