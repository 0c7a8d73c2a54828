"""AOT export (jax.export serialized StableHLO) — the serving story the
reference lacks: artifact round-trips without the model code."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geot_tpu.engine.export import export_forward, load_forward
from geot_tpu.models import build_model_from_cfg

SEG = dict(NAME="PointTransformer_seg_T", trans_dim=48, depth=3, num_heads=4,
           group_size=8, num_group=16, encoder_dims=32, nclasses=17,
           drop_path_rate=0.0, downsample_targets=[64, 32, 16],
           extract_layers=[1, 2, 3])
N, B = 128, 2


def _build():
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": SEG})
    key = jax.random.PRNGKey(0)
    pos = jnp.zeros((B, N, 3))
    variables = jax.jit(model.init)(
        {"params": key, "dropout": jax.random.fold_in(key, 1)},
        {"pos": pos, "x": pos, "cls": jnp.zeros((B, 1), jnp.int32)})
    return model, variables


@pytest.mark.slow
def test_export_roundtrip_embedded(tmp_path):
    model, variables = _build()
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    cls = jnp.zeros((B, 1), jnp.int32)
    ref = model.apply(variables, {"pos": pos, "x": pos, "cls": cls})[0]

    path = export_forward(model, variables, n_points=N, batch=B,
                          out=str(tmp_path / "model.bin"))
    fwd = load_forward(path)
    out = fwd(pos, cls)
    assert out.shape == (B, N, 17)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_export_runtime_params(tmp_path):
    model, variables = _build()
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    cls = jnp.zeros((B, 1), jnp.int32)
    blob = export_forward(model, variables, n_points=N, batch=B,
                          embed_params=False)
    fwd = load_forward(blob)
    out = fwd(variables, pos, cls)
    ref = model.apply(variables, {"pos": pos, "x": pos, "cls": cls})[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_export_cli_with_checkpoint(tmp_path):
    """The export CLI restores an orbax checkpoint and writes an artifact."""
    import jax

    from geot_tpu.engine.checkpoint import save_checkpoint
    from geot_tpu.engine.export import export_cli, load_forward
    from geot_tpu.engine.state import TrainState
    from geot_tpu.optim import build_optimizer_from_cfg

    model, variables = _build()
    tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    state = TrainState.create(variables, tx)
    cfg = {"ckpt_dir": str(tmp_path), "run_name": "exp"}
    save_checkpoint(cfg, state, epoch=1, additional_dict={}, is_best=False)

    import yaml

    cfg_yaml = tmp_path / "model.yaml"
    cfg_yaml.write_text(yaml.dump({"model": {"NAME": "WholePartSeg",
                                             "segmentor_args": dict(SEG)}}))
    out = tmp_path / "model.bin"
    export_cli(["--cfg", str(cfg_yaml),
                "--ckpt", str(tmp_path / "exp_ckpt_latest"),
                "--out", str(out), "--n_points", str(N), "--batch", "1"])
    fwd = load_forward(str(out))
    pos = jnp.zeros((1, N, 3))
    assert fwd(pos, jnp.zeros((1, 1), jnp.int32)).shape == (1, N, 17)
