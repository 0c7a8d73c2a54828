"""Round-3 layer-surface closure: the FULL reference
``openpoints/models/layers/__init__.py`` export list resolves from
``geot_tpu.models.layers``, and the newly added members behave.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geot_tpu.models.layers as L

# the reference's complete export list (``layers/__init__.py:1-15``)
REFERENCE_LAYER_EXPORTS = [
    # weight_init
    "trunc_normal_", "variance_scaling_", "lecun_normal_",
    # helpers
    "MultipleSequential",
    # drop
    "DropBlock2d", "DropPath", "drop_block_2d", "drop_path",
    # norm / activation
    "create_norm", "create_act",
    # mlp
    "Mlp", "GluMlp", "GatedMlp", "ConvMlp",
    # conv (import *)
    "Conv1d", "Conv2d", "create_convblock1d", "create_convblock2d",
    "create_linearblock", "CreateResConvBlock2D",
    # knn
    "knn_point", "KNN", "DilatedKNN",
    # group_embed
    "SubsampleGroup", "PointPatchEmbed", "P3Embed",
    # group
    "torch_grouping_operation", "grouping_operation", "gather_operation",
    "create_grouper", "get_aggregation_feautres",
    # subsample
    "random_sample", "furthest_point_sample", "fps",
    # upsampling
    "three_interpolate", "three_nn", "three_interpolation",
    # attention
    "TransformerEncoder",
    # local_aggregation
    "LocalAggregation", "CHANNEL_MAP",
]


def test_reference_export_list_complete():
    missing = [n for n in REFERENCE_LAYER_EXPORTS if not hasattr(L, n)]
    assert not missing, f"layer exports missing vs reference: {missing}"


def test_all_list_resolves():
    missing = [n for n in L.__all__ if not hasattr(L, n)]
    assert not missing


# ---------------------------------------------------------------- weight init
def test_trunc_normal_bounds_and_stats():
    key = jax.random.PRNGKey(0)
    x = L.trunc_normal_(key, (20000,), mean=0.0, std=0.02)
    assert float(jnp.max(jnp.abs(x))) <= 2.0 + 1e-6  # absolute bounds (torch)
    assert abs(float(jnp.mean(x))) < 2e-3
    assert abs(float(jnp.std(x)) - 0.02) < 2e-3


def test_trunc_normal_matches_torch():
    torch = pytest.importorskip("torch")
    # same construction -> same distribution; compare quantiles
    key = jax.random.PRNGKey(1)
    ours = np.asarray(L.trunc_normal_(key, (50000,), std=1.0, a=-2, b=2))
    t = torch.empty(50000)
    torch.manual_seed(0)
    import torch.nn.init as tinit
    tinit.trunc_normal_(t, std=1.0, a=-2.0, b=2.0)
    theirs = t.numpy()
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        assert abs(np.quantile(ours, q) - np.quantile(theirs, q)) < 0.03


def test_variance_scaling_fans():
    key = jax.random.PRNGKey(2)
    # torch fan convention: (out, in) -> fan_in = shape[1]
    x = L.variance_scaling_(key, (64, 256), scale=1.0, mode="fan_in",
                            distribution="normal")
    assert abs(float(jnp.std(x)) - 1 / np.sqrt(256)) < 5e-3
    # timm quirk kept: the truncated-normal branch divides std by .8796 (the
    # +-2 sigma correction) but truncates at ABSOLUTE +-2, so for small std
    # the output std is sigma/.8796, not sigma (reference weight_init.py:79)
    y = L.lecun_normal_(jax.random.PRNGKey(3), (64, 256))
    assert abs(float(jnp.std(y)) - 1 / np.sqrt(256) / 0.87962566) < 5e-3


# ----------------------------------------------------------------------- mlp
@pytest.mark.parametrize("cls,kw", [
    (L.Mlp, {}),
    (L.GluMlp, {"hidden_features": 32}),
    (L.GatedMlp, {}),
    (L.ConvMlp, {"norm_args": "ln"}),
])
def test_mlp_family_forward(cls, kw):
    m = cls(out_features=24, **kw)
    x = jnp.ones((2, 16, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 16, 24)
    # dropout active only in training
    y2 = m.apply(v, x, training=True,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    assert y2.shape == y.shape


def test_glu_mlp_gating_math():
    m = L.GluMlp(hidden_features=4, out_features=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 5)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    h = x @ v["params"]["fc1"]["kernel"] + v["params"]["fc1"]["bias"]
    gated = h[..., :2] * jax.nn.sigmoid(h[..., 2:])
    want = gated @ v["params"]["fc2"]["kernel"] + v["params"]["fc2"]["bias"]
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------- drop
def test_drop_path_function():
    x = jnp.ones((64, 4))
    assert float(jnp.sum(L.drop_path(x, jax.random.PRNGKey(0), 0.5,
                                     training=False))) == 64 * 4
    y = L.drop_path(x, jax.random.PRNGKey(0), 0.5, training=True)
    rows = np.asarray(jnp.sum(y, axis=1))
    # surviving rows are scaled by 1/keep = 2
    assert set(np.round(np.unique(rows), 4)) <= {0.0, 8.0}
    assert 0.0 in rows and 8.0 in rows


def test_drop_block_2d_shapes_and_eval_identity():
    x = jnp.ones((2, 16, 16, 4))
    m = L.DropBlock2d(drop_prob=0.3, block_size=5, fast=True)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    np.testing.assert_array_equal(np.asarray(m.apply(v, x)), np.asarray(x))
    y = m.apply(v, x, training=True, rngs={"dropout": jax.random.PRNGKey(2)})
    arr = np.asarray(y)
    assert arr.shape == x.shape and (arr == 0).any() and (arr > 0).any()
    # slow (valid-block) variant too
    m2 = L.DropBlock2d(drop_prob=0.3, block_size=5, fast=False)
    y2 = m2.apply(v, x, training=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert (np.asarray(y2) == 0).any()


def test_drop_block_fns_normalise():
    x = jnp.ones((1, 32, 32, 8))
    y = L.drop_block_fast_2d(x, jax.random.PRNGKey(0), drop_prob=0.2,
                             block_size=5)
    assert abs(float(jnp.mean(y)) - 1.0) < 1e-4  # rescaled to keep the mean
    y2 = L.drop_block_2d(x, jax.random.PRNGKey(0), drop_prob=0.2, block_size=5)
    assert abs(float(jnp.mean(y2)) - 1.0) < 1e-4


# ------------------------------------------------------------------- helpers
def test_multiple_sequential_threads_tuples():
    import flax.linen as nn

    class TwoOut(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            return a + 1, b * 2

    class Sum(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            return a + b

    m = L.MultipleSequential(layers=(TwoOut(), Sum()))
    v = m.init(jax.random.PRNGKey(0), jnp.ones(3), jnp.ones(3))
    out = m.apply(v, jnp.ones(3), jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out), 4.0)  # (1+1) + 1*2


def test_to_ntuple():
    assert L.to_2tuple(3) == (3, 3)
    assert L.to_2tuple((1, 2)) == (1, 2)
    assert L.to_ntuple(3)(5) == (5, 5, 5)


# ----------------------------------------------------------------- conv fact
def test_create_res_conv_block_2d():
    m = L.CreateResConvBlock2D(mlps=(8, 16, 8), norm_args="bn",
                               act_args="relu")
    x = jnp.ones((2, 4, 6, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    y, _ = m.apply(v, x, training=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert float(jnp.min(y)) >= 0.0  # final relu


def test_pointwise_conv_wrappers():
    m = L.Conv1d(8, 16)
    x = jnp.ones((2, 10, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (2, 10, 16)
    with pytest.raises(NotImplementedError):
        L.Conv2d(8, 16, 3)


# ----------------------------------------------------------- dilated knn etc
def test_dense_dilated_stride_and_stochastic():
    idx = jnp.arange(18).reshape(1, 1, 18)
    d = L.DenseDilated(k=9, dilation=2)
    np.testing.assert_array_equal(np.asarray(d(idx))[0, 0],
                                  np.arange(0, 18, 2))
    ds = L.DenseDilated(k=9, dilation=2, stochastic=True, epsilon=1.0)
    out = np.asarray(ds(idx, rng=jax.random.PRNGKey(0), training=True))[0, 0]
    assert out.shape == (9,) and len(set(out.tolist())) == 9


def test_kmeans_embed_forward():
    m = L.KMeansEmbed(num_groups=8, encoder_dim=32)
    xyz = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 3)),
                      jnp.float32)
    v = m.init(jax.random.PRNGKey(0), xyz)
    centroids, feats, p_i, labels = m.apply(v, xyz)
    assert centroids.shape == (2, 8, 3) and feats.shape == (2, 8, 32)
    assert p_i.shape == (2, 128, 3) and labels.shape == (2, 128)
    assert int(jnp.max(labels)) < 8


def test_torch_grouping_operation_layout():
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 10)),
                        jnp.float32)          # (B, C, N)
    idx = jnp.zeros((2, 4, 3), jnp.int32)
    out = L.torch_grouping_operation(feats, idx)
    assert out.shape == (2, 5, 4, 3)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]),
                               np.asarray(feats[0, :, 0]))


@pytest.mark.slow
def test_pointmlp_constructors():
    from geot_tpu.models.backbone.pointmlp import pointMLP, pointMLPElite

    for ctor in (pointMLP, pointMLPElite):
        m = ctor()
        # k_neighbors=24 needs >= 24 supports at the last (N/2^3-point) stage
        xyz = jnp.asarray(np.random.default_rng(0)
                          .standard_normal((1, 256, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), xyz)
        _, x = m.apply(v, xyz, mutable=["batch_stats"])[0]
        assert x.shape[0] == 1 and x.shape[1] == 16  # 256 / 2^4
