"""Round-2 registry-gap closures: BasePartSeg, DistillBaseSeg,
PointMLPGenEncoder/V2, ViewDecoder_ds, graph_conv layers, plateau scheduler."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.models import build_model_from_cfg

B, N = 2, 128

POINTMLP_TINY = {"embed_dim": 8, "dim_expansion": [2], "pre_blocks": [1],
                 "pos_blocks": [1], "k_neighbors": [8], "reducers": [2]}


@pytest.fixture
def pos(rng):
    return jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))


def _init(model, *args):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, *args)


def test_pointmlp_gen_encoder(pos):
    m = build_model_from_cfg({"NAME": "PointMLPGenEncoder", **POINTMLP_TINY})
    toks, centers = m.apply(_init(m, pos), pos)
    assert toks.shape == (B, N // 2, 16) and centers.shape == (B, N // 2, 3)


def test_pointmlp_encoder_v2(pos):
    m = build_model_from_cfg({"NAME": "PointMLPEncoderV2", **POINTMLP_TINY,
                              "feat_channels": 24})
    out = m.apply(_init(m, pos), pos)
    assert out.shape == (B, 24)


def test_base_part_seg(pos):
    m = build_model_from_cfg({
        "NAME": "BasePartSeg",
        "encoder_args": {"NAME": "PointNet2Encoder", "in_channels": 3,
                         "width": 8, "layers": 2, "strides": [4, 4],
                         "radius": 0.2, "num_samples": 8, "blocks": [1, 1],
                         "aggr_args": {"feature_type": "dp_fj"}},
        "decoder_args": {"NAME": "PointNet2PartDecoder", "shape_classes": 2},
        "cls_args": {"NAME": "VariableSegHead", "num_classes": 17,
                     "in_channels": 16}})
    batch = {"pos": pos, "x": pos, "cls": jnp.zeros((B, 1), jnp.int32)}
    out = m.apply(_init(m, batch), batch)
    assert out.shape == (B, N, 17)


def test_distill_base_seg(pos):
    m = build_model_from_cfg({
        "NAME": "DistillBaseSeg",
        "encoder_args": {"NAME": "PointNet2Encoder", "in_channels": 3,
                         "width": 8, "layers": 2, "strides": [4, 4],
                         "radius": 0.2, "num_samples": 8, "blocks": [1, 1],
                         "aggr_args": {"feature_type": "dp_fj"}},
        "decoder_args": {"NAME": "PointNet2Decoder"},
        "cls_args": {"NAME": "VariableSegHead", "num_classes": 17,
                     "in_channels": 16},
        "distill_args": {"ignored": True}})
    out = m.apply(_init(m, {"pos": pos, "x": pos}), {"pos": pos, "x": pos})
    assert out.shape == (B, N, 17)


def test_view_decoder_ds(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    m = build_model_from_cfg({"NAME": "ViewDecoder_ds", "in_channels": 32,
                              "out_channels": 3})
    outs = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert [o.shape for o in outs] == [(2, 8, 8, 3), (2, 16, 16, 3),
                                       (2, 32, 32, 3), (2, 64, 64, 3)]
    for o in outs:
        assert (np.asarray(o) >= 0).all() and (np.asarray(o) <= 1).all()


def test_graph_conv_layers(pos):
    from geot_tpu.models.layers import (DenseDynBlock, DynConv, GraphConv,
                                        ResDynBlock)
    from geot_tpu.ops import knn

    x = jnp.concatenate([pos, pos], axis=-1)           # (B, N, 6)
    _, eidx = knn(pos, pos, 8)

    for conv in ("edge", "mrconv"):
        m = GraphConv(16, conv=conv)
        out = m.apply(m.init(jax.random.PRNGKey(0), x, eidx), x, eidx)
        assert out.shape == (B, N, 16), conv

    m = DynConv(16, k=8)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, N, 16)

    m = ResDynBlock(6, k=8)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, N, 6)

    m = DenseDynBlock(6, 16, k=8)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, N, 16)
    np.testing.assert_allclose(np.asarray(out[..., :6]), np.asarray(x))


def test_plateau_scheduler():
    from geot_tpu.optim import PlateauSchedule, build_scheduler_from_cfg

    s = build_scheduler_from_cfg({"sched": "plateau", "lr": 1.0,
                                  "decay_rate": 0.5, "patience_epochs": 2,
                                  "min_lr": 0.01, "warmup_epochs": 2,
                                  "warmup_lr": 0.1})
    assert isinstance(s, PlateauSchedule)
    # 1-based epochs, t = epoch - 1 like the timm ports
    assert s(1) == pytest.approx(0.1)           # warmup start
    assert s(2) == pytest.approx(0.55)          # warmup midpoint
    assert s(3) == pytest.approx(1.0)           # warmup done

    s.note_metric(0.5)                          # best=0.5
    s.note_metric(0.6)                          # improves
    for _ in range(2):                          # 2 bad epochs: within patience
        s.note_metric(0.6)
    assert s(5) == pytest.approx(1.0)
    s.note_metric(0.6)                          # 3rd bad epoch > patience
    assert s(6) == pytest.approx(0.5)
    # floor at min_lr
    for _ in range(40):
        s.note_metric(0.0)
    assert s(50) >= 0.01

    # resume round-trip
    s2 = PlateauSchedule(1.0)
    s2.load_state_dict(s.state_dict())
    assert s2(50) == s(50)
