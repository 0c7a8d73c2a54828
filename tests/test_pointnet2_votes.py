"""Votenet-era SA/LFP modules (reference ``pointnet2/pointnet2_modules.py``
161-722): shapes, index passthrough, pooling modes, unique-fill semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geot_tpu.models.backbone as B
from geot_tpu.models.backbone.pointnet2_votes import unique_fill
from geot_tpu.models.layers.common import SharedMLP

BATCH, N, C = 2, 64, 8


@pytest.fixture
def xyz(rng):
    return jnp.asarray(rng.standard_normal((BATCH, N, 3)).astype(np.float32))


@pytest.fixture
def feats(rng):
    return jnp.asarray(rng.standard_normal((BATCH, N, C)).astype(np.float32))


def _init(m, *args):
    return m.init(jax.random.PRNGKey(0), *args)


def test_backbone_exports_pointnet2_modules_surface():
    for name in ["PointnetSAModule", "PointnetSAModuleMSG",
                 "PointnetFPModule", "PointnetSAModuleVotes",
                 "PointnetSAModuleVotes_nofps",
                 "PointnetSAModuleVotes_nogrouping",
                 "PointnetSAModuleMSGVotes", "PointnetLFPModuleMSG"]:
        assert hasattr(B, name), name


def test_unique_fill_compacts_and_cycles():
    idx = jnp.asarray([[[5, 2, 5, 2, 9, 9, 9, 5]]], dtype=jnp.int32)
    filled, cnt = unique_fill(idx)
    assert int(cnt[0, 0]) == 3
    # uniques first (ascending), then cycled
    np.testing.assert_array_equal(np.asarray(filled[0, 0]),
                                  [2, 5, 9, 2, 5, 9, 2, 5])


def test_unique_fill_full_ball_is_identity_sorted():
    idx = jnp.asarray([[[3, 1, 0, 2]]], dtype=jnp.int32)
    filled, cnt = unique_fill(idx)
    assert int(cnt[0, 0]) == 4
    np.testing.assert_array_equal(np.asarray(filled[0, 0]), [0, 1, 2, 3])


@pytest.mark.parametrize("pooling", ["max", "avg", "rbf"])
def test_sa_votes_shapes_and_inds(xyz, feats, pooling):
    m = B.PointnetSAModuleVotes(mlp=[C, 16, 24], npoint=16, radius=0.5,
                                nsample=8, pooling=pooling)
    v = _init(m, xyz, feats)
    new_xyz, new_f, inds = m.apply(v, xyz, feats)
    assert new_xyz.shape == (BATCH, 16, 3)
    assert new_f.shape == (BATCH, 16, 24)
    assert inds.shape == (BATCH, 16)
    # passthrough: supplied inds are echoed and determine new_xyz
    my_inds = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None], (BATCH, 1))
    new_xyz2, _, inds2 = m.apply(v, xyz, feats, my_inds)
    np.testing.assert_array_equal(np.asarray(inds2), np.asarray(my_inds))
    np.testing.assert_allclose(np.asarray(new_xyz2), np.asarray(xyz[:, :16]),
                               rtol=1e-6)


def test_sa_votes_unique_cnt(xyz, feats):
    m = B.PointnetSAModuleVotes(mlp=[C, 16], npoint=16, radius=0.4, nsample=8,
                                sample_uniformly=True, ret_unique_cnt=True)
    v = _init(m, xyz, feats)
    new_xyz, new_f, inds, cnt = m.apply(v, xyz, feats)
    assert cnt.shape == (BATCH, 16)
    assert int(jnp.min(cnt)) >= 1 and int(jnp.max(cnt)) <= 8


def test_sa_votes_groupall(xyz, feats):
    m = B.PointnetSAModuleVotes(mlp=[C, 16], npoint=None)
    v = _init(m, xyz, feats)
    new_xyz, new_f, inds = m.apply(v, xyz, feats)
    assert new_xyz is None and inds is None
    assert new_f.shape == (BATCH, 1, 16)


def test_sa_votes_nofps_matches_mlp_maxpool(rng):
    grouped = jnp.asarray(
        rng.standard_normal((BATCH, 16, 8, C)).astype(np.float32))
    m = B.PointnetSAModuleVotes_nofps(mlp=[C, 16, 24], npoint=16, radius=0.5,
                                      nsample=8)
    v = _init(m, grouped)
    echo, new_f, inds = m.apply(v, grouped)
    assert echo is grouped or np.allclose(np.asarray(echo),
                                          np.asarray(grouped))
    ref_mlp = SharedMLP((16, 24))
    rv = {"params": v["params"]["mlp_module"],
          "batch_stats": v["batch_stats"]["mlp_module"]}
    expect = jnp.max(ref_mlp.apply(rv, grouped), axis=2)
    np.testing.assert_allclose(np.asarray(new_f), np.asarray(expect),
                               rtol=1e-6)


def test_sa_votes_nogrouping_is_pointwise_on_zeros_cat(xyz, feats):
    m = B.PointnetSAModuleVotes_nogrouping(mlp=[C, 16, 24], npoint=N,
                                           radius=0.5, nsample=8)
    v = _init(m, xyz, feats)
    inds = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (BATCH, 1))
    new_xyz, new_f, _ = m.apply(v, xyz, feats, inds)
    ref_mlp = SharedMLP((16, 24))
    rv = {"params": v["params"]["mlp_module"],
          "batch_stats": v["batch_stats"]["mlp_module"]}
    expect = ref_mlp.apply(rv, jnp.concatenate(
        [jnp.zeros_like(xyz), feats], -1))
    np.testing.assert_allclose(np.asarray(new_f), np.asarray(expect),
                               rtol=1e-6)


def test_msg_votes_concat_width(xyz, feats):
    m = B.PointnetSAModuleMSGVotes(mlps=[[C, 16], [C, 8, 12]], npoint=16,
                                   radii=[0.3, 0.6], nsamples=[4, 8])
    v = _init(m, xyz, feats)
    new_xyz, new_f, inds = m.apply(v, xyz, feats)
    assert new_f.shape == (BATCH, 16, 16 + 12)
    assert inds.shape == (BATCH, 16)


def test_lfp_msg_shape_and_skip(xyz, feats, rng):
    xyz2 = xyz[:, :16]
    feats2 = jnp.asarray(
        rng.standard_normal((BATCH, 16, 6)).astype(np.float32))
    m = B.PointnetLFPModuleMSG(mlps=[[C, 16], [C, 16]], radii=[0.4, 0.8],
                               nsamples=[4, 8], post_mlp=[16 + 6, 32])
    v = _init(m, xyz2, xyz, feats2, feats)
    out = m.apply(v, xyz2, xyz, feats2, feats)
    assert out.shape == (BATCH, 16, 64)   # post_mlp[-1] * num scales
