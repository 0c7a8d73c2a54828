"""Config-driven layer factories (create_act/create_norm/create_convblock*).

Reference surface: ``openpoints/models/layers/{activation.py,norm.py,conv.py}``.
Includes a fresh torch oracle for the conv-norm-act block numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geot_tpu.models.layers import (create_act, create_norm,
                                    create_convblock1d, create_convblock2d,
                                    create_linearblock, PointBatchNorm)
import flax.linen as nn


class TestCreateAct:
    def test_none_paths(self):
        assert create_act(None) is None
        assert create_act({"inplace": True}) is None  # no 'act' key

    def test_names(self):
        x = jnp.array([-2.0, 0.0, 3.0])
        relu = create_act("relu")
        np.testing.assert_allclose(relu(x), [0.0, 0.0, 3.0])
        lrelu = create_act({"act": "leakyrelu", "negative_slope": 0.1,
                            "inplace": True})
        np.testing.assert_allclose(lrelu(x), [-0.2, 0.0, 3.0], rtol=1e-6)
        gelu = create_act("gelu")
        # exact (erf) gelu, matching torch nn.GELU default
        np.testing.assert_allclose(gelu(jnp.array([1.0])), [0.8413447],
                                   rtol=1e-5)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            create_act("nosuchact")

    def test_prelu_is_module(self):
        m = create_act("prelu")
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))
        y = m.apply(v, jnp.array([[-1.0, 2.0, -3.0]]))
        np.testing.assert_allclose(y, [[-0.01, 2.0, -0.03]], rtol=1e-6)


class TestCreateNorm:
    def test_none_paths(self):
        assert create_norm(None, 8) is None
        assert create_norm({"eps": 1e-3}, 8) is None  # no 'norm' key

    def test_bn_aliases_collapse(self):
        for name in ("bn", "bn1d", "bn2d", "syncbn", "fastbn1d"):
            m = create_norm({"norm": name}, 8)
            assert isinstance(m, PointBatchNorm)
        # dimension-alias rule: plain 'bn' + dimension resolves
        assert isinstance(create_norm("bn", 8, dimension="2d"),
                          PointBatchNorm)

    def test_bn_momentum_conversion(self):
        m = create_norm({"norm": "bn", "momentum": 0.1}, 8)
        assert m.momentum == pytest.approx(0.9)  # torch 0.1 == flax 0.9

    def test_ln_gn_instance(self):
        assert isinstance(create_norm("ln", 8), nn.LayerNorm)
        gn = create_norm({"norm": "gn", "num_groups": 4}, 8)
        assert isinstance(gn, nn.GroupNorm) and gn.num_groups == 4
        inorm = create_norm("in1d", 8)
        assert isinstance(inorm, nn.GroupNorm) and inorm.num_groups == 8
        with pytest.raises(ValueError):
            create_norm("in1d", None)
        with pytest.raises(ValueError):
            create_norm("nosuchnorm", 8)


class TestConvBlocks:
    def _fwd(self, block, x, training=False):
        v = block.init(jax.random.PRNGKey(0), x, training=False)
        return v, block.apply(v, x, training=training,
                              mutable=["batch_stats"] if training else [])

    def test_bias_dropped_under_norm(self):
        # reference conv.py:31 — a present norm removes the conv bias
        b = create_convblock1d(16, 32, norm_args={"norm": "bn"},
                               act_args={"act": "relu"})
        v, _ = self._fwd(b, jnp.ones((2, 10, 16)))
        assert "bias" not in v["params"]["conv"]
        b2 = create_convblock1d(16, 32, act_args="relu")
        v2, _ = self._fwd(b2, jnp.ones((2, 10, 16)))
        assert "bias" in v2["params"]["conv"]

    def test_orders_and_shapes(self):
        x = jnp.ones((2, 5, 7, 16))  # (B, G, K, C): the 2d-block layout
        for order in ("conv-norm-act", "norm-act-conv", "conv-act-norm"):
            b = create_convblock2d(16, 32, norm_args="ln", act_args="relu",
                                   order=order)
            _, (y, _aux) = self._fwd(b, x)
            assert y.shape == (2, 5, 7, 32)
        with pytest.raises(NotImplementedError):
            b = create_convblock1d(16, 32, order="act-conv-norm")
            self._fwd(b, jnp.ones((2, 5, 16)))

    def test_kernel_size_guard(self):
        create_convblock1d(16, 32, 1)  # positional kernel_size=1 ok
        with pytest.raises(NotImplementedError):
            create_convblock2d(16, 32, kernel_size=3)

    def test_linearblock_matches_convblock1d(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
        bl = create_linearblock(16, 32, norm_args="ln", act_args="relu")
        bc = create_convblock1d(16, 32, norm_args="ln", act_args="relu")
        v, (y1, _) = self._fwd(bl, x)
        y2 = bc.apply(v, x, training=False, mutable=[])[0]
        np.testing.assert_allclose(y1, y2)

    def test_torch_oracle_conv_bn_relu(self):
        """conv-norm-act numerics vs a fresh torch Conv1d+BN1d+ReLU oracle
        (eval mode, shared weights)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 10, 16)).astype(np.float32)
        w = rng.standard_normal((16, 32)).astype(np.float32)
        gamma = rng.standard_normal(32).astype(np.float32)
        beta = rng.standard_normal(32).astype(np.float32)
        mean = rng.standard_normal(32).astype(np.float32)
        var = rng.random(32).astype(np.float32) + 0.5

        block = create_convblock1d(16, 32, norm_args={"norm": "bn1d"},
                                   act_args={"act": "relu"})
        v = block.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
        v = {"params": {"conv": {"kernel": jnp.asarray(w)},
                        "norm": {"bn": {"scale": jnp.asarray(gamma),
                                        "bias": jnp.asarray(beta)}}},
             "batch_stats": {"norm": {"bn": {"mean": jnp.asarray(mean),
                                             "var": jnp.asarray(var)}}}}
        y = np.asarray(block.apply(v, jnp.asarray(x), training=False))

        tconv = torch.nn.Conv1d(16, 32, 1, bias=False)
        tbn = torch.nn.BatchNorm1d(32)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.T[:, :, None]))
            tbn.weight.copy_(torch.from_numpy(gamma))
            tbn.bias.copy_(torch.from_numpy(beta))
            tbn.running_mean.copy_(torch.from_numpy(mean))
            tbn.running_var.copy_(torch.from_numpy(var))
            tbn.eval()
            ref = torch.relu(tbn(tconv(
                torch.from_numpy(x).permute(0, 2, 1)))).permute(0, 2, 1)
        np.testing.assert_allclose(y, ref.numpy(), atol=2e-5)


class TestListComposeAndDist:
    def test_list_compose(self):
        from geot_tpu.data.transforms import ListCompose
        t = ListCompose([lambda c, f, l: (c + 1, f, l),
                         lambda c, f, l: (c, f * 2, l)])
        c, f, l = t(np.zeros(3), np.ones(3), np.arange(3))
        np.testing.assert_allclose(c, 1.0)
        np.testing.assert_allclose(f, 2.0)

    def test_dist_info_and_port(self):
        from geot_tpu.parallel import find_free_port, get_dist_info
        rank, world = get_dist_info()
        assert rank == 0 and world >= 1
        p = find_free_port()
        assert 0 < p < 65536
