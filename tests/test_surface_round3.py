"""Round-3 audit closures: reference-name surface + layer-decay optimizer.

Covers the stragglers a symbol-level sweep of the reference found missing:
- ``openpoints.cpp.pointops`` helper API: ``queryandgroup``/``querygroup``/
  ``interpolation`` (reference ``functions/pointops.py:106-259``),
- ``PSNR`` (``utils/metrics.py:8``), ``cal_model_parm_nums``
  (``utils/ckpt_util.py:12``),
- loss-name aliases ``threeD_space_loss``/``Idenyity_loss``
  (``utils/insT_loss.py:61,113``),
- dataset helpers ``jitter_pointcloud``/``rotate_pointcloud``/
  ``translate_pointcloud`` (``shapenetpart.py:48-74``),
- ``gather_features`` (``layers/graph_conv.py:8``), ``square_distance``
  (``backbone/pointmlp.py:45``),
- collate aliases (``dataset/build.py:13,30``),
- optimizer ``layer_decay`` (``optim_factory.py:58-120,177-186``).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_queryandgroup_matches_manual():
    from geot_tpu.ops import grouping_operation, knn
    from geot_tpu.ops.compat import openpoints_pointops as po

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    new_xyz = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((2, 64, 5)).astype(np.float32))

    out = po.queryandgroup(8, xyz, new_xyz, feat)
    assert out.shape == (2, 16, 8, 8)                      # 3 + c
    _, idx = knn(new_xyz, xyz, 8)
    want_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
    np.testing.assert_allclose(np.asarray(out[..., :3]),
                               np.asarray(want_xyz), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 3:]),
                               np.asarray(grouping_operation(feat, idx)),
                               rtol=1e-6)
    # use_xyz=False drops the coords; 2-D (flat, offset-style) inputs squeeze
    out2 = po.queryandgroup(8, xyz[0], new_xyz[0], feat[0], use_xyz=False)
    assert out2.shape == (16, 8, 5)


def test_querygroup_normalize_dp():
    from geot_tpu.ops.compat import openpoints_pointops as po

    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    gx, gf = po.querygroup(4, xyz, xyz, None, normalize_dp=True)
    assert gf is None and gx.shape == (1, 64, 4, 3)
    norms = np.linalg.norm(np.asarray(gx), axis=-1)
    assert norms.max() <= 1.0 + 1e-5                       # normalized rel coords


def test_interpolation_matches_three_interpolation():
    from geot_tpu.ops import three_interpolation
    from geot_tpu.ops.compat import openpoints_pointops as po

    rng = np.random.default_rng(2)
    known = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
    unknown = jnp.asarray(rng.standard_normal((1, 80, 3)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((1, 32, 6)).astype(np.float32))
    out = po.interpolation(known, unknown, feat)
    want = three_interpolation(unknown, known, feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
    # general k path: weights sum to one -> constant features interpolate to
    # the same constant
    const = jnp.ones((1, 32, 2))
    out5 = po.interpolation(known, unknown, const, k=5)
    np.testing.assert_allclose(np.asarray(out5), 1.0, rtol=1e-5)


def test_metrics_and_loss_aliases():
    from geot_tpu.core.metrics import PSNR, cal_model_parm_nums
    from geot_tpu import losses

    assert abs(PSNR(0.01) - 20.0) < 1e-9
    assert abs(PSNR(0.25, peak=0.5) - 0.0) < 1e-9
    assert cal_model_parm_nums({"a": np.zeros((2, 3)),
                                "b": {"c": np.zeros(5)}}) == 11
    assert losses.threeD_space_loss is losses.threed_space_loss
    assert losses.Idenyity_loss is losses.identity_loss


def test_dataset_and_layer_helpers():
    from geot_tpu.data.build import collate_fn_val, concat_collate_fn, default_collate
    from geot_tpu.data.shapenetpart import (jitter_pointcloud,
                                            rotate_pointcloud,
                                            translate_pointcloud)
    from geot_tpu.models.layers.graph_conv import gather_features
    from geot_tpu.models.backbone.pointmlp import square_distance

    assert concat_collate_fn is default_collate and collate_fn_val is default_collate

    rng = np.random.default_rng(3)
    pc = rng.standard_normal((32, 3)).astype(np.float32)
    j = jitter_pointcloud(pc.copy(), rng=np.random.default_rng(4))
    assert j.shape == pc.shape and np.abs(j - pc).max() <= 0.02 + 1e-7
    r = rotate_pointcloud(pc.copy(), rng=np.random.default_rng(5))
    np.testing.assert_allclose(r[:, 1], pc[:, 1])          # y untouched
    np.testing.assert_allclose(np.linalg.norm(r[:, [0, 2]], axis=1),
                               np.linalg.norm(pc[:, [0, 2]], axis=1), rtol=1e-5)
    t = translate_pointcloud(pc.copy(), rng=np.random.default_rng(6))
    assert t.dtype == np.float32 and t.shape == pc.shape

    feats = jnp.asarray(rng.standard_normal((2, 6, 10, 1)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 10, (2, 10, 4)).astype(np.int32))
    g = gather_features(feats, idx)
    assert g.shape == (2, 6, 10, 4)
    np.testing.assert_allclose(np.asarray(g[1, :, 3, 2]),
                               np.asarray(feats[1, :, int(idx[1, 3, 2]), 0]))

    src = jnp.asarray(rng.standard_normal((1, 5, 3)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((1, 7, 3)).astype(np.float32))
    d = square_distance(src, dst)
    want = ((np.asarray(src)[:, :, None] - np.asarray(dst)[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), want, atol=1e-5)


def test_layer_decay_scales_updates():
    import optax
    from geot_tpu.optim.factory import build_optimizer_from_cfg

    params = {
        "encoder": {"conv1a": {"kernel": jnp.ones((3, 4))}},
        "blocks": {"block_0": {"qkv": {"kernel": jnp.ones((4, 4))}},
                   "block_2": {"qkv": {"kernel": jnp.ones((4, 4))}}},
        "seg_head": {"conv2": {"kernel": jnp.ones((4, 2))}},
    }
    ld = 0.5
    tx = build_optimizer_from_cfg(None, lr=1.0,
                                  **{"NAME": "sgd", "weight_decay": 0.0,
                                     "momentum": 0.0, "layer_decay": ld})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # num_layers = 3 (max block idx 2 + 1); scales: embeddings ld^4,
    # block_0 ld^3, block_2 ld^1, head 1.0
    head = float(updates["seg_head"]["conv2"]["kernel"][0, 0])
    b2 = float(updates["blocks"]["block_2"]["qkv"]["kernel"][0, 0])
    b0 = float(updates["blocks"]["block_0"]["qkv"]["kernel"][0, 0])
    emb = float(updates["encoder"]["conv1a"]["kernel"][0, 0])
    assert abs(b2 / head - ld) < 1e-6
    assert abs(b0 / head - ld ** 3) < 1e-6
    assert abs(emb / head - ld ** 4) < 1e-6

    # without layer_decay all updates are equal
    tx0 = build_optimizer_from_cfg(None, lr=1.0,
                                   **{"NAME": "sgd", "weight_decay": 0.0,
                                      "momentum": 0.0})
    u0, _ = tx0.update(grads, tx0.init(params), params)
    vals = {float(v.reshape(-1)[0]) for v in jax.tree_util.tree_leaves(u0)}
    assert len(vals) == 1
