"""Reference-API compatibility surface tests."""
import numpy as np
import jax.numpy as jnp

from geot_tpu.ops.compat import pointops, pointnet2_utils


def test_pointops_surface(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    idx, d = pointops.knn(x, x, 4)
    assert idx.shape == (2, 64, 4) and d.shape == (2, 64, 4)
    np.testing.assert_allclose(np.asarray(d)[:, :, 0], 0.0, atol=1e-5)  # squared, self
    sampled = pointops.fps(x, 16)
    assert sampled.shape == (2, 16, 3)
    w = jnp.asarray(rng.uniform(0.5, 1, (2, 64)).astype(np.float32))
    assert pointops.fps_weight(x, 8, w).shape == (2, 8, 3)


def test_pointnet2_utils_surface(rng):
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    feats_cf = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32))
    idx = pointnet2_utils.furthest_point_sample(xyz, 16)
    g = pointnet2_utils.gather_operation(feats_cf, idx)
    assert g.shape == (2, 5, 16)
    d, i3 = pointnet2_utils.three_nn(xyz, xyz[:, :16])
    w = 1.0 / (d + 1e-8)
    w = w / jnp.sum(w, -1, keepdims=True)
    interp = pointnet2_utils.three_interpolate(feats_cf[:, :, :16], i3, w)
    assert interp.shape == (2, 5, 64)
    gidx = pointnet2_utils.ball_query(0.5, 8, xyz, xyz[:, :16])
    grouped = pointnet2_utils.grouping_operation(feats_cf, gidx)
    assert grouped.shape == (2, 5, 16, 8)
