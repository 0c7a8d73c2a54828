"""Loss tests: numpy/torch-free oracles + property checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.losses import (LOSS, ContrastState, build_criterion_from_cfg,
                             contrast_loss_t, feature_space_loss,
                             identity_loss, threed_space_loss)

B, N, C = 2, 64, 17


@pytest.fixture
def logits(rng):
    return jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))


@pytest.fixture
def labels(rng):
    return jnp.asarray(rng.integers(0, C, (B, N)))


def np_poly1_focal(logits, labels, eps=1.0, alpha=0.25, gamma=2.0):
    p = 1 / (1 + np.exp(-logits))
    onehot = np.eye(C)[labels]
    ce = -(onehot * np.log(p + 1e-12) + (1 - onehot) * np.log(1 - p + 1e-12))
    pt = onehot * p + (1 - onehot) * (1 - p)
    fl = ce * (1 - pt) ** gamma
    at = alpha * onehot + (1 - alpha) * (1 - onehot)
    return at * fl + eps * (1 - pt) ** (gamma + 1)


class TestPoly1Focal:
    def test_matches_numpy(self, logits, labels):
        crit = build_criterion_from_cfg({"NAME": "Poly1FocalLoss"})
        got = float(crit(logits, labels))
        ref = np_poly1_focal(np.asarray(logits), np.asarray(labels)).mean()
        assert abs(got - ref) < 1e-5

    def test_masked_u_variant(self, logits, labels, rng):
        crit = build_criterion_from_cfg({"NAME": "Poly1FocalLoss_U_corr"})
        conf = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
        got = float(crit(logits, labels, conf, thresh=0.5))
        elem = np_poly1_focal(np.asarray(logits), np.asarray(labels))
        m = (np.asarray(conf) >= 0.5)[..., None] * np.ones((1, 1, C))
        ref = (elem * m).sum() / (m.sum() + 0.001)
        assert abs(got - ref) < 1e-5

    def test_mask_all_below_threshold(self, logits, labels):
        crit = build_criterion_from_cfg({"NAME": "Poly1FocalLoss_U"})
        conf = jnp.zeros((B, N))
        got = float(crit(logits, labels, conf, thresh=0.5))
        assert got == pytest.approx(0.0, abs=1e-6)

    def test_loss_registry_has_reference_surface(self):
        for name in ["CrossEntropy", "CrossEntropyLoss", "SmoothCrossEntropy",
                     "MaskedCrossEntropy", "BCELogits", "FocalLoss",
                     "Poly1CrossEntropyLoss", "Poly1FocalLoss",
                     "Poly1FocalLoss_U", "Poly1FocalLoss_U_corr",
                     "Poly1FocalLoss_U_T", "Weight_CELoss", "Weight_CELoss_U",
                     "MSE_Loss_U", "MultiShapeCrossEntropy"]:
            assert name in LOSS, name


class TestManifoldLosses:
    def test_threed_zero_when_T_constant(self, rng):
        pos = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
        labels = jnp.zeros((1, 32), dtype=jnp.int32)
        ins_T = jnp.broadcast_to(jnp.eye(C), (32, C, C))
        loss = threed_space_loss(k=4)(pos, labels, ins_T)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_threed_positive_when_T_varies(self, rng):
        pos = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
        labels = jnp.zeros((1, 32), dtype=jnp.int32)
        ins_T = jnp.asarray(rng.uniform(0, 1, (32, C, C)).astype(np.float32))
        loss = threed_space_loss(k=4)(pos, labels, ins_T)
        assert float(loss) > 0

    def test_feature_space_sign_structure(self, rng):
        # with all-different labels, weights are negative -> loss <= 0
        probs = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((1, 16, C)).astype(np.float32)), -1)
        labels = jnp.arange(16)[None] % C
        ins_T = jnp.asarray(rng.uniform(0, 1, (16, C, C)).astype(np.float32))
        lf = feature_space_loss(k=3)(probs, labels, ins_T)
        # mixed labels: not asserting sign strictly, just finiteness
        assert np.isfinite(float(lf))

    def test_identity_loss(self, rng):
        ins_T = jnp.broadcast_to(jnp.eye(C), (8, C, C))
        assert float(identity_loss()(ins_T)) == pytest.approx(0.0, abs=1e-7)
        ins_T2 = jnp.zeros((8, C, C))
        # off-diagonal deviations are masked out; diagonal deviation is 1
        assert float(identity_loss()(ins_T2)) == pytest.approx(1.0, abs=1e-6)


class TestContrast:
    def test_loss_and_queue_update(self, rng):
        state = ContrastState.create(jax.random.PRNGKey(0), queue_size=64, dim=8)
        feat_s = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
        feat_t = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
        score = jnp.asarray(rng.uniform(0, 1, (2, 32)).astype(np.float32))
        loss, new_state = contrast_loss_t(state, jax.random.PRNGKey(1),
                                          feat_s, score, feat_t,
                                          threshold=0.5, sample_nums=16)
        assert np.isfinite(float(loss))
        assert int(new_state.ptr) != 0
        assert not np.allclose(np.asarray(new_state.queue), np.asarray(state.queue))
        # queue rows stay normalised
        norms = np.linalg.norm(np.asarray(new_state.queue), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_no_confident_points_returns_zero(self, rng):
        state = ContrastState.create(jax.random.PRNGKey(0), queue_size=64, dim=8)
        feat_s = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
        loss, new_state = contrast_loss_t(state, jax.random.PRNGKey(1),
                                          feat_s, jnp.zeros((1, 16)), feat_s,
                                          threshold=0.9, sample_nums=8)
        assert float(loss) == 0.0
        np.testing.assert_allclose(np.asarray(new_state.queue),
                                   np.asarray(state.queue))

    def test_jittable(self, rng):
        state = ContrastState.create(jax.random.PRNGKey(0), queue_size=32, dim=4)
        f = jax.jit(lambda s, r, a, sc, b: contrast_loss_t(s, r, a, sc, b,
                                                           sample_nums=8))
        feat = jnp.asarray(rng.standard_normal((1, 16, 4)).astype(np.float32))
        score = jnp.asarray(rng.uniform(0, 1, (1, 16)).astype(np.float32))
        loss, _ = f(state, jax.random.PRNGKey(1), feat, score, feat)
        assert np.isfinite(float(loss))


class TestThreedAnchors:
    """Subsampled-anchor mode of the 3d manifold loss (round-5 perf lever):
    anchors=M must be an unbiased estimator of the all-points loss with
    neighbour structure unchanged."""

    def _cloud(self, rng, B=2, N=64):
        pos = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, C, (B, N)), jnp.int32)
        ins_T = jnp.asarray(rng.uniform(0, 1, (B * N, C, C)).astype(np.float32))
        return pos, labels, ins_T

    def test_weighted_t_dist_anchor_identity(self, rng):
        """anchor_idx=arange must reproduce the anchorless path exactly."""
        from geot_tpu.losses.inst_loss import (_neighbour_weights,
                                               _weighted_t_dist_sum)
        pos, labels, ins_T = self._cloud(rng)
        idx, w = _neighbour_weights(pos, labels, 4, 1.0, 1.0, 0.0)
        full = _weighted_t_dist_sum(ins_T, idx, w)
        B, N = labels.shape
        aidx = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
        anch = _weighted_t_dist_sum(ins_T, idx, w, anchor_idx=aidx)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(anch))

    def test_anchored_matches_bruteforce_oracle(self, rng, monkeypatch):
        """With pinned anchor indices, the anchored loss equals a numpy
        brute-force evaluation of the reference formula restricted to those
        anchors (neighbours over the FULL cloud)."""
        B, N, M, k, sigma = 2, 64, 16, 4, 1.0
        pos, labels, ins_T = self._cloud(rng, B, N)
        aidx = np.stack([np.random.default_rng(7 + b).permutation(N)[:M]
                         for b in range(B)])
        monkeypatch.setattr(jax.random, "randint",
                            lambda key, shape, lo, hi: jnp.asarray(aidx))
        loss = threed_space_loss(k=k, sigma=sigma, anchors=M)(
            pos, labels, ins_T, rng=jax.random.PRNGKey(0))

        p = np.asarray(pos)
        lab = np.asarray(labels)
        t = np.asarray(ins_T).reshape(B, N, C * C)
        per = []
        for b in range(B):
            for a in aidx[b]:
                d2 = np.sum((p[b] - p[b, a]) ** 2, -1)
                order = np.argsort(d2)
                neigh = [j for j in order if j != a][:k]
                w = np.array([(lab[b, j] == lab[b, a])
                              * np.exp(-d2[j] / (2 * sigma ** 2))
                              for j in neigh])
                wtd = np.sum(w * np.sum((t[b, neigh] - t[b, a]) ** 2, -1))
                per.append(wtd / (np.sum(w) + 0.001))
        assert float(loss) == pytest.approx(float(np.mean(per)), rel=2e-4)

    def test_anchored_estimator_unbiased(self, rng):
        """Averaged over many anchor draws, the subsampled loss converges on
        the all-points loss (fixed seeds -> deterministic assertion)."""
        pos, labels, ins_T = self._cloud(rng, B=2, N=128)
        full = float(threed_space_loss(k=4)(pos, labels, ins_T))
        lo = threed_space_loss(k=4, anchors=32)
        draws = [float(lo(pos, labels, ins_T, rng=jax.random.PRNGKey(i)))
                 for i in range(40)]
        assert np.mean(draws) == pytest.approx(full, rel=0.05)

    def test_anchored_gradients_flow(self, rng):
        pos, labels, ins_T = self._cloud(rng, B=1, N=64)
        lo = threed_space_loss(k=4, anchors=16)
        g = jax.grad(lambda T: lo(pos, labels, T,
                                  rng=jax.random.PRNGKey(3)))(ins_T)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0
