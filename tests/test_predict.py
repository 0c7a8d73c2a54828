"""Inference CLI end-to-end test."""
import json
import os

import numpy as np
import pytest

from geot_tpu.data.tooth_semi import _synthetic_scan
from geot_tpu.engine.predict import main


@pytest.mark.slow
def test_predict_cli(tmp_path):
    pts, _ = _synthetic_scan(5, 4000)
    obj = tmp_path / "scan_lower.obj"
    with open(obj, "w") as f:
        for p in pts:
            f.write(f"v {p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
    out = tmp_path / "pred.json"
    ply = tmp_path / "pred.ply"
    cfg = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi",
                       "smoke.yaml")
    main(["--cfg", cfg, "--input", str(obj), "--output", str(out),
          "--ply", str(ply), "num_points=256"])
    d = json.load(open(out))
    assert d["jaw"] == "lower" and d["n_points"] == 4000
    assert all(l == 0 or (31 <= l <= 48) for l in d["labels"])  # lower FDI codes
    assert ply.exists()


def test_profiler_and_writer(tmp_path):
    from geot_tpu.engine.profiler import StepTimer
    from geot_tpu.engine.writer import SummaryWriter

    t = StepTimer(str(tmp_path / "steps.jsonl"))
    t.tick(0)
    t.tick(1)
    assert t.mean >= 0
    t.close()
    assert (tmp_path / "steps.jsonl").exists()

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 3)
    w.close()
    line = json.loads(open(tmp_path / "scalars.jsonl").read().strip())
    assert line["tag"] == "loss" and line["step"] == 3


@pytest.mark.slow
def test_predict_stream_directory(tmp_path):
    """Directory batch mode: every scan gets a json, order preserved,
    predictions identical to the one-shot path on the same draw."""
    scans = tmp_path / "scans"
    scans.mkdir()
    sizes = {"a_lower.npy": 3000, "b_upper.npy": 5000, "c_lower.npy": 3000}
    for name, n in sizes.items():
        pts, _ = _synthetic_scan(hash(name) % 97, n)
        np.save(scans / name, pts)
    outdir = tmp_path / "out"
    cfg = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi",
                       "smoke.yaml")
    n = main(["--cfg", cfg, "--input", str(scans), "--output", str(outdir),
              "num_points=256"])
    assert n == 3
    for name, npts in sizes.items():
        d = json.load(open(outdir / (name.replace(".npy", ".json"))))
        assert d["n_points"] == npts
        lo = d["jaw"] == "lower"
        assert all(l == 0 or (31 <= l <= 48 if lo else 11 <= l <= 28)
                   for l in d["labels"])


@pytest.mark.slow
def test_predict_cli_votes(tmp_path):
    """--votes runs TTA passes through the cfg's vote pipeline and still
    produces valid full-res labels."""
    pts, _ = _synthetic_scan(9, 3000)
    npy = tmp_path / "scan_lower.npy"
    np.save(npy, pts)
    out = tmp_path / "pred.json"
    cfg = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi",
                       "transformer_finetune_fixmatch_ntm.yaml")
    main(["--cfg", cfg, "--input", str(npy), "--output", str(out),
          "--votes", "2", "num_points=256",
          "model.segmentor_args.trans_dim=48",
          "model.segmentor_args.depth=3",
          "model.segmentor_args.num_heads=4",
          "model.segmentor_args.group_size=8",
          "model.segmentor_args.num_group=16",
          "model.segmentor_args.encoder_dims=32",
          "model.segmentor_args.downsample_targets=[128,64,32]",
          "model.segmentor_args.extract_layers=[1,2,3]"])
    d = json.load(open(out))
    assert d["n_points"] == 3000
    assert all(l == 0 or 31 <= l <= 48 for l in d["labels"])


@pytest.mark.slow
def test_predict_ensemble():
    """Ensemble mode: a duplicate-member ensemble reproduces the single-model
    predictions exactly (mean of identical softmax = the softmax), and a
    two-member ensemble's sampled-point argmax equals the hand-computed
    mean-probability argmax."""
    import jax
    import jax.numpy as jnp

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.predict import load_model_and_params, predict_scan

    cfg = EasyConfig()
    cfg.load(os.path.join(os.path.dirname(__file__), "..", "cfgs",
                          "tooth_semi", "smoke.yaml"), recursive=True)
    model, v1 = load_model_and_params(cfg, None)
    pts, _ = _synthetic_scan(11, 3000)

    pred_single, logit_single = predict_scan(model, v1, pts, jaw=0,
                                             num_points=256)
    pred_dup, logit_dup = predict_scan(model, (v1, v1), pts, jaw=0,
                                       num_points=256)
    np.testing.assert_array_equal(pred_single, pred_dup)
    np.testing.assert_array_equal(np.argmax(np.asarray(logit_single), -1),
                                  np.argmax(np.asarray(logit_dup), -1))

    # a genuinely different second member: re-init with another seed
    model2, v2 = load_model_and_params(cfg, None)
    key = jax.random.PRNGKey(7)
    v2 = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(key, p.shape, p.dtype)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, v2)
    _, logit_a = predict_scan(model, v1, pts, jaw=0, num_points=256)
    _, logit_b = predict_scan(model, v2, pts, jaw=0, num_points=256)
    _, logit_ens = predict_scan(model, (v1, v2), pts, jaw=0, num_points=256)
    mean_p = 0.5 * (jax.nn.softmax(logit_a, -1) + jax.nn.softmax(logit_b, -1))
    np.testing.assert_array_equal(
        np.argmax(np.asarray(logit_ens), -1),
        np.argmax(np.asarray(mean_p), -1))


@pytest.mark.slow
def test_predict_stream_ensemble_invariant():
    """Streaming ensemble: duplicate members == single member, and the
    comma-separated --ckpt form parses into a member tuple."""
    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.predict import load_model_and_params, predict_stream

    cfg = EasyConfig()
    cfg.load(os.path.join(os.path.dirname(__file__), "..", "cfgs",
                          "tooth_semi", "smoke.yaml"), recursive=True)
    model, v = load_model_and_params(cfg, None)

    def items():
        for i in range(3):
            pts, _ = _synthetic_scan(60 + i, 2000)
            yield f"s{i}", pts, i % 2

    single = [(n, p.copy()) for n, _, p, _ in
              predict_stream(model, v, items(), num_points=256)]
    ens = [(n, p.copy()) for n, _, p, _ in
           predict_stream(model, (v, v), items(), num_points=256)]
    for (_, a), (_, b) in zip(single, ens):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_predict_stream_multidevice_invariant():
    """Round-robin serving across the 8-device CPU mesh yields exactly the
    single-device labels (placement invariance of the scale-out path)."""
    import jax

    if len(jax.local_devices()) < 2:
        pytest.skip("needs multiple devices")

    import jax.numpy as jnp

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.predict import load_model_and_params, predict_stream

    cfg = EasyConfig()
    cfg.load(os.path.join(os.path.dirname(__file__), "..", "cfgs",
                          "tooth_semi", "smoke.yaml"), recursive=True)
    model, variables = load_model_and_params(cfg, None)

    def items():
        for i in range(5):
            pts, _ = _synthetic_scan(40 + i, 3000)
            yield f"s{i}", pts, i % 2

    single = [(n, p.copy()) for n, _, p, _ in
              predict_stream(model, variables, items(), num_points=256)]
    multi = [(n, p.copy()) for n, _, p, _ in
             predict_stream(model, variables, items(), num_points=256,
                            devices=jax.local_devices())]
    assert [n for n, _ in single] == [n for n, _ in multi]
    for (_, a), (_, b) in zip(single, multi):
        np.testing.assert_array_equal(a, b)
