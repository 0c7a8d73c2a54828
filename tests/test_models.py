"""Module-level tests (SURVEY.md §4 item 2): registry construction from
YAML-shaped configs, forward shapes/dtypes at reduced sizes, train/eval mode
behaviour."""
import numpy as np
import flax
import jax
import jax.numpy as jnp
import pytest

from geot_tpu import EasyConfig
from geot_tpu.models import build_model_from_cfg

# reduced flagship config (same structure as
# cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml, smaller dims)
SEG_T_CFG = {
    "NAME": "WholePartSeg",
    "segmentor_args": {
        "NAME": "PointTransformer_seg_T",
        "trans_dim": 48,
        "depth": 3,
        "num_heads": 4,
        "group_size": 8,
        "num_group": 32,
        "encoder_dims": 32,
        "nclasses": 17,
        "drop_path_rate": 0.1,
        "downsample_targets": [128, 64, 32],
        "extract_layers": [1, 2, 3],
        "pretrained_path": "/nonexistent/ok_to_ignore.pth",
    },
}

B, N, C = 2, 256, 17


def make_batch(rng, n=N, b=B):
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    return {"pos": pos, "x": pos, "cls": jnp.zeros((b, 1), dtype=jnp.int32)}


@pytest.fixture(scope="module")
def seg_t():
    model = build_model_from_cfg(EasyConfig(SEG_T_CFG))
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, batch)
    return model, variables, batch


class TestPointTransformerSegT:
    def test_forward_shapes(self, seg_t):
        model, variables, batch = seg_t
        logit, corr, sigma, feats = model.apply(variables, batch)
        assert logit.shape == (B, N, C)
        assert corr is None  # no T passed
        assert sigma.shape == (C,)
        assert feats.shape == (B, N, 48)
        assert np.isfinite(np.asarray(logit)).all()

    @pytest.mark.slow
    def test_t_correction(self, seg_t):
        model, variables, batch = seg_t
        u0 = {k + "_s": v for k, v in make_batch(np.random.default_rng(1)).items()}
        u0.update({k + "_w": v for k, v in make_batch(np.random.default_rng(2)).items()})
        u0["T"] = jnp.eye(C)
        logit, corr, sigma, _ = model.apply(variables, batch, u0=u0, fixmatch=True)
        assert logit.shape == (3 * B, N, C)
        # T_linear is zero-init so the correction starts at exactly 0
        np.testing.assert_allclose(np.asarray(corr), 0.0)

    def test_teacher_path(self, seg_t):
        model, variables, _ = seg_t
        u0 = {k + "_w": v for k, v in make_batch(np.random.default_rng(1)).items()}
        logit, _, _, _ = model.apply(variables, u0, if_teacher=True)
        assert logit.shape == (B, N, C)

    def test_train_mode_needs_dropout_rng_and_differs(self, seg_t):
        model, variables, batch = seg_t
        l1, *_ = model.apply(variables, batch, training=True,
                             rngs={"dropout": jax.random.PRNGKey(5)},
                             mutable=["batch_stats"])[0]
        l2, *_ = model.apply(variables, batch)
        # dropout 0.5 in the head makes train-mode logits differ from eval
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_batch_stats_update(self, seg_t):
        model, variables, batch = seg_t
        _, mutated = model.apply(variables, batch, training=True,
                                 rngs={"dropout": jax.random.PRNGKey(5)},
                                 mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))


class TestSigT:
    def test_sig_t_mean_rows_normalised(self):
        model = build_model_from_cfg({"NAME": "Ins_T_mean",
                                      "T_args": {"NAME": "sig_t_mean", "nclasses": C}})
        x = jax.nn.softmax(jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, C)).astype(np.float32)), -1)
        cm = jnp.eye(C)
        variables = model.init(jax.random.PRNGKey(0), x, cm)
        out = model.apply(variables, x, cm)
        assert out.shape == (2 * 64, C, C)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
        assert (np.asarray(out) > 0).all()

    def test_sig_t_mean_matches_per_class_loop(self):
        """The einsum vectorisation must equal the reference's per-class
        Linear(2C->C) loop (``transformer.py:1120-1131``)."""
        model = build_model_from_cfg({"NAME": "sig_t_mean", "nclasses": 5})
        rng = np.random.default_rng(3)
        x = jax.nn.softmax(jnp.asarray(rng.standard_normal((1, 8, 5)).astype(np.float32)), -1)
        cm = jnp.asarray(rng.standard_normal((5, 5)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, cm)
        out = np.asarray(model.apply(variables, x, cm))
        w = np.asarray(variables["params"]["fc"])   # (C, 2C, C)
        xf = np.asarray(x).reshape(-1, 5)
        ref = np.empty((8, 5, 5), dtype=np.float32)
        for kk in range(5):
            inp = np.concatenate([xf, np.tile(np.asarray(cm)[kk], (8, 1))], axis=1)
            ref[:, kk, :] = inp @ w[kk]
        ref = np.clip(ref, 1e-5, 1 - 1e-5)
        ref = ref / ref.sum(-1, keepdims=True)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestPointNet2:
    @pytest.mark.slow
    def test_ssg_forward(self):
        """BASELINE.json config 1: PointNet++ SSG forward on a synthetic cloud."""
        cfg = {
            "NAME": "BaseSeg",
            "encoder_args": {
                "NAME": "PointNet2Encoder",
                "in_channels": 3,
                "width": 16,
                "layers": 2,
                "strides": [4, 4],
                "radius": 0.2,
                "num_samples": 16,
                "blocks": [1, 1],
                "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
            },
            "decoder_args": {"NAME": "PointNet2Decoder"},
            "cls_args": {"NAME": "SegHead", "num_classes": 17, "mlps": [32]},
        }
        model = build_model_from_cfg(EasyConfig(cfg))
        pos = jnp.asarray(np.random.default_rng(0).standard_normal((2, 512, 3)).astype(np.float32))
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, {"pos": pos, "x": pos})
        out = model.apply(variables, {"pos": pos, "x": pos})
        assert out.shape == (2, 512, 17)
        assert np.isfinite(np.asarray(out)).all()


class TestDGCNN:
    def test_cls_feat(self):
        cfg = {"NAME": "DGCNN", "in_channels": 3, "channels": 16,
               "embed_dim": 64, "n_blocks": 3, "k": 8}
        model = build_model_from_cfg(cfg)
        pos = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), pos)
        feat = model.apply(variables, pos, method="forward_cls_feat")
        assert feat.shape == (2, 128)


class TestPointMLP:
    def test_encoder_forward(self):
        cfg = {"NAME": "PointMLPEncoder", "in_channels": 3, "embed_dim": 8,
               "dim_expansion": [2, 2], "pre_blocks": [1, 1], "pos_blocks": [1, 1],
               "k_neighbors": [8, 8], "reducers": [2, 2]}
        model = build_model_from_cfg(cfg)
        pos = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), pos)
        xyz, x = model.apply(variables, pos)
        assert xyz.shape == (2, 32, 3) and x.shape == (2, 32, 32)


class TestLayersExtra:
    def test_assa_aggregation(self):
        import flax.linen as nn
        from geot_tpu.models.layers.local_aggregation import LocalAggregation

        rng_np = np.random.default_rng(0)
        pos = jnp.asarray(rng_np.standard_normal((2, 64, 3)).astype(np.float32))
        feats = jnp.asarray(rng_np.standard_normal((2, 64, 12)).astype(np.float32))
        la = LocalAggregation((24, 24), {"NAME": "ballquery", "radius": 0.5,
                                         "nsample": 8},
                              feature_type="assa", reduction="mean")
        v = la.init(jax.random.PRNGKey(0), pos[:, :16], pos, feats)
        out = la.apply(v, pos[:, :16], pos, feats)
        assert out.shape == (2, 16, 24)
        assert np.isfinite(np.asarray(out)).all()

    def test_point_patch_embed(self):
        from geot_tpu.models import build_model_from_cfg

        rng_np = np.random.default_rng(0)
        pos = jnp.asarray(rng_np.standard_normal((2, 128, 3)).astype(np.float32))
        m = build_model_from_cfg({"NAME": "PointPatchEmbed",
                                  "sample_ratio": 0.25, "group_size": 8,
                                  "channels": [16, 32]})
        v = m.init(jax.random.PRNGKey(0), pos)
        tokens, center = m.apply(v, pos)
        assert tokens.shape == (2, 32, 32) and center.shape == (2, 32, 3)


class TestFastPyramid:
    def test_fast_pyramid_forward(self, rng):
        cfg = dict(SEG_T_CFG["segmentor_args"])
        cfg["fast_pyramid"] = True
        model = build_model_from_cfg(EasyConfig({"NAME": "WholePartSeg",
                                                 "segmentor_args": cfg}))
        batch = make_batch(rng)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, batch)
        logit, *_ = model.apply(variables, batch)
        assert logit.shape == (B, N, C)
        assert np.isfinite(np.asarray(logit)).all()

    def test_fast_graph_forward_and_exact_mode_unaffected(self, rng):
        # fast_graph reuses the DGCNN cross-level kNN indices for the second
        # edge conv; only honoured under the stratified serving order
        cfg = dict(SEG_T_CFG["segmentor_args"])
        cfg["fast_pyramid"] = True
        cfg["fast_graph"] = True
        model = build_model_from_cfg(EasyConfig({"NAME": "WholePartSeg",
                                                 "segmentor_args": cfg}))
        batch = make_batch(rng)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, batch)
        logit, *_ = model.apply(variables, batch)
        assert logit.shape == (B, N, C)
        assert np.isfinite(np.asarray(logit)).all()

        # without fast_pyramid the flag is a no-op: bit-identical to baseline
        cfg_ng = dict(SEG_T_CFG["segmentor_args"])
        cfg_ng["fast_graph"] = True
        m_ng = build_model_from_cfg(EasyConfig({"NAME": "WholePartSeg",
                                                "segmentor_args": cfg_ng}))
        m_base = build_model_from_cfg(EasyConfig(
            {"NAME": "WholePartSeg",
             "segmentor_args": dict(SEG_T_CFG["segmentor_args"])}))
        v = m_base.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch)
        np.testing.assert_array_equal(np.asarray(m_ng.apply(v, batch)[0]),
                                      np.asarray(m_base.apply(v, batch)[0]))


class TestFastPyramidClusterAlignment:
    @pytest.mark.slow
    def test_cluster_feats_share_logit_inverse_perm(self, rng):
        """Under fast_pyramid the cluster head's 64-d contrast features must
        go through the SAME inverse permutation as the logits (review r3: the
        projection was computed from the still-permuted f_l0 AFTER the
        un-permute, pairing point i's logit with point inv(i)'s feature).

        Both the logits and the projection are pointwise functions of f_l0,
        so matching output logit rows to the (captured) pre-un-permute
        seg_head rows recovers the permutation; the features must follow it."""
        cfg = {"NAME": "PointTransformer_seg_cluster", "trans_dim": 48,
               "depth": 3, "num_heads": 4, "group_size": 8, "num_group": 16,
               "encoder_dims": 32, "nclasses": 17, "drop_path_rate": 0.0,
               "downsample_targets": [64, 32, 16], "extract_layers": [1, 2, 3],
               "fast_pyramid": True}
        m = build_model_from_cfg(EasyConfig(cfg))
        pos = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
        cls0 = jnp.zeros((1,), jnp.int32)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, pos, None, cls0)
        (logit, _, _, feats), inter = m.apply(
            v, pos, None, cls0, capture_intermediates=True,
            mutable=["intermediates"])
        flat = {"/".join(k): val for k, val in
                flax.traverse_util.flatten_dict(inter["intermediates"]).items()}
        raw_logit = np.asarray(next(
            val for k, val in flat.items()
            if k.endswith("seg_head/__call__"))[0])
        raw_h = np.asarray(next(
            val for k, val in flat.items()
            if k.endswith("proj_bn_2/__call__"))[0])
        logit, feats = np.asarray(logit), np.asarray(feats)
        d = np.linalg.norm(logit[0][:, None, :] -
                           raw_logit[0].astype(np.float32)[None], axis=-1)
        j = d.argmin(axis=1)                       # output row i <- raw row j
        assert sorted(j.tolist()) == list(range(128)), "perm must be bijective"
        np.testing.assert_allclose(
            feats[0], raw_h[0].astype(np.float32)[j], rtol=1e-4, atol=1e-5)
