"""Forward smoke for every registered model not covered elsewhere — catches
construction/apply bugs across the whole zoo."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.models import build_model_from_cfg

B, N = 2, 128


@pytest.fixture
def pos(rng):
    return jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))


def _init(model, *args):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, *args)


def test_cls_token_encoders(pos):
    for name, check in (
        ("PointTransformerGenEncoder",
         lambda o: o[0].shape == (B, 16, 48) and o[1].shape == (B, 16, 3)),
        ("PointTransformerEncoder",
         lambda o: o.shape == (B, 96)),
    ):
        m = build_model_from_cfg({
            "NAME": name, "num_groups": 16, "group_size": 8,
            "encoder_dims": 32, "trans_dim": 48, "depth": 2, "num_heads": 4,
            "group": "knn"})
        out = m.apply(_init(m, pos), pos)
        assert check(out), name


def test_genencoder_tapped(pos):
    m = build_model_from_cfg({
        "NAME": "PointTransformer_genencoder", "trans_dim": 48, "depth": 2,
        "num_heads": 4, "group_size": 8, "num_group": 16, "encoder_dims": 32,
        "extract_layers": [1, 2]})
    toks, center = m.apply(_init(m, pos), pos)
    assert toks.shape == (B, 16, 48) and center.shape == (B, 16, 3)


def test_whole_part_seg_ntm(pos):
    m = build_model_from_cfg({
        "NAME": "WholePartSeg_ntm",
        "segmentor_args": {"NAME": "PointTransformer_seg", "trans_dim": 48,
                           "depth": 3, "num_heads": 4, "group_size": 8,
                           "num_group": 16, "encoder_dims": 32, "nclasses": 17,
                           "drop_path_rate": 0.0,
                           "downsample_targets": [64, 32, 16],
                           "extract_layers": [1, 2, 3]}})
    batch = {"pos": pos, "x": pos, "cls": jnp.zeros((B, 1), jnp.int32)}
    logit, *_ = m.apply(_init(m, batch), batch)
    assert logit.shape == (B, N, 17)


def test_base_cls_with_head(pos):
    m = build_model_from_cfg({
        "NAME": "BaseCls",
        "encoder_args": {"NAME": "DGCNN", "channels": 8, "embed_dim": 16,
                         "n_blocks": 3, "k": 8},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15, "mlps": [32, 16]}})
    out = m.apply(_init(m, {"pos": pos, "x": pos}), {"pos": pos, "x": pos})
    assert out.shape == (B, 15)


def test_distill_cls(pos):
    m = build_model_from_cfg({
        "NAME": "DistillCls",
        "encoder_args": {"NAME": "PointMLPEncoder", "embed_dim": 8,
                         "dim_expansion": [2], "pre_blocks": [1],
                         "pos_blocks": [1], "k_neighbors": [8], "reducers": [2]},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15, "mlps": [16]}})
    logits, feats = m.apply(_init(m, pos), pos)
    assert logits.shape == (B, 15) and feats.shape == (B, 16)


def test_variable_seg_and_heads(pos):
    m = build_model_from_cfg({
        "NAME": "VariableSeg",
        "encoder_args": {"NAME": "PointNet2Encoder", "in_channels": 3,
                         "width": 8, "layers": 2, "strides": [4, 4],
                         "radius": 0.2, "num_samples": 8, "blocks": [1, 1],
                         "aggr_args": {"feature_type": "dp_fj"}},
        "decoder_args": {"NAME": "PointNet2Decoder"},
        "cls_args": {"NAME": "VariableSegHead", "num_classes": 17,
                     "in_channels": 16}})
    out = m.apply(_init(m, {"pos": pos, "x": pos}), {"pos": pos, "x": pos})
    assert out.shape == (B, N, 17)


def test_multi_seg_head(rng):
    f = jnp.asarray(rng.standard_normal((B, N, 16)).astype(np.float32))
    m = build_model_from_cfg({"NAME": "MultiSegHead", "in_channels": 16,
                              "shape_classes": 4, "num_parts": [2, 3, 4, 2]})
    out = m.apply(_init(m, f), f)
    assert out.shape == (4, B, N, 4)  # padded to max parts


def test_sig_t(rng):
    probs = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((1, 16, 17)).astype(np.float32)), -1)
    m = build_model_from_cfg({"NAME": "sig_t", "nclasses": 17})
    out = m.apply(m.init(jax.random.PRNGKey(0), probs), probs)
    assert out.shape == (16, 17, 17)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_pointmlp_alias(pos):
    m = build_model_from_cfg({"NAME": "PointMLP", "embed_dim": 8,
                              "dim_expansion": [2], "pre_blocks": [1],
                              "pos_blocks": [1], "k_neighbors": [8],
                              "reducers": [2]})
    xyz, x = m.apply(_init(m, pos), pos)
    assert x.shape == (B, 64, 16)


def test_p3embed(pos):
    m = build_model_from_cfg({"NAME": "P3Embed", "stages": 2,
                              "sample_ratio": 0.5, "group_size": 8,
                              "channels": [8, 16]})
    feats, centers = m.apply(_init(m, pos), pos)
    assert feats.shape[0] == B and centers.shape[-1] == 3


@pytest.mark.slow
def test_view_decoder_big(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    m = build_model_from_cfg({"NAME": "ViewDecoder_big", "in_channels": 32,
                              "out_channels": 3})
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 64, 64, 3)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
