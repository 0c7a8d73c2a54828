"""Op-level golden tests against numpy oracles (SURVEY.md §4 item 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu import ops


def np_pairwise_dist2(q, s):
    return ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)


def np_fps(xyz, npoint, weights=None):
    """Oracle mirroring pointops/src/sampling/sampling_cuda_kernel.cu."""
    N = xyz.shape[0]
    idx = np.zeros(npoint, dtype=np.int64)
    min_d2 = np.full(N, 1e10, dtype=np.float64)
    last = 0
    for j in range(1, npoint):
        d2 = ((xyz - xyz[last]) ** 2).sum(-1)
        if weights is not None:
            d2 = d2 * np.maximum(weights, 1e-12)
        min_d2 = np.minimum(min_d2, d2)
        last = int(np.argmax(min_d2))
        idx[j] = last
    return idx


class TestKnn:
    def test_matches_bruteforce(self, rng):
        q = rng.standard_normal((2, 100, 3)).astype(np.float32)
        s = rng.standard_normal((2, 300, 3)).astype(np.float32)
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(s), 5, chunk_size=64)
        for b in range(2):
            d2 = np_pairwise_dist2(q[b], s[b])
            ref_i = np.argsort(d2, axis=1)[:, :5]
            ref_d = np.sqrt(np.take_along_axis(d2, ref_i, axis=1))
            np.testing.assert_allclose(np.asarray(d)[b], ref_d, atol=1e-3)
            # indices may differ on exact ties; compare distances at indices
            got = np.sqrt(np.take_along_axis(d2, np.asarray(i)[b], axis=1))
            np.testing.assert_allclose(got, ref_d, atol=1e-3)

    def test_single_chunk_path(self, rng):
        q = rng.standard_normal((1, 16, 3)).astype(np.float32)
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(q), 3, chunk_size=1024)
        # first neighbour is self with ~0 distance
        np.testing.assert_allclose(np.asarray(d)[0, :, 0], 0.0, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(16))

    def test_sorted_ascending(self, rng):
        q = rng.standard_normal((1, 64, 3)).astype(np.float32)
        d, _ = ops.knn(jnp.asarray(q), jnp.asarray(q), 8, chunk_size=16)
        d = np.asarray(d)[0]
        assert (np.diff(d, axis=1) >= -1e-6).all()

    def test_knn_point_alias(self, rng):
        q = rng.standard_normal((1, 32, 17)).astype(np.float32)  # feature-space knn
        d, i = ops.knn_point(4, jnp.asarray(q))
        assert d.shape == (1, 32, 4) and i.shape == (1, 32, 4)


class TestFps:
    def test_matches_oracle(self, rng):
        xyz = rng.standard_normal((2, 200, 3)).astype(np.float32)
        idx = np.asarray(ops.fps(jnp.asarray(xyz), 50))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], np_fps(xyz[b], 50))

    def test_first_index_is_zero(self, rng):
        xyz = rng.standard_normal((3, 64, 3)).astype(np.float32)
        idx = np.asarray(ops.fps(jnp.asarray(xyz), 16))
        assert (idx[:, 0] == 0).all()

    def test_weighted_matches_oracle(self, rng):
        xyz = rng.standard_normal((1, 128, 3)).astype(np.float32)
        w = rng.uniform(0.1, 1.0, (1, 128)).astype(np.float32)
        idx = np.asarray(ops.fps_weighted(jnp.asarray(xyz), jnp.asarray(w), 32))
        np.testing.assert_array_equal(idx[0], np_fps(xyz[0], 32, weights=w[0]))

    def test_indices_unique(self, rng):
        xyz = rng.standard_normal((1, 100, 3)).astype(np.float32)
        idx = np.asarray(ops.fps(jnp.asarray(xyz), 40))[0]
        assert len(set(idx.tolist())) == 40

    def test_fps_gather_shape(self, rng):
        xyz = rng.standard_normal((2, 100, 3)).astype(np.float32)
        out = ops.fps_gather(jnp.asarray(xyz), 10)
        assert out.shape == (2, 10, 3)


class TestBallQuery:
    def test_matches_oracle(self, rng):
        s = rng.standard_normal((1, 200, 3)).astype(np.float32)
        q = s[:, :50]
        radius, k = 0.5, 8
        idx = np.asarray(ops.ball_query(radius, k, jnp.asarray(s), jnp.asarray(q),
                                        chunk_size=64))[0]
        d2 = np_pairwise_dist2(q[0], s[0])
        for j in range(50):
            hits = np.where(d2[j] < radius * radius)[0][:k]
            expect = np.full(k, hits[0] if len(hits) else 0)
            expect[: len(hits)] = hits
            np.testing.assert_array_equal(idx[j], expect)

    def test_empty_ball_returns_zero(self):
        s = jnp.ones((1, 32, 3)) * 100.0
        q = jnp.zeros((1, 4, 3))
        idx = np.asarray(ops.ball_query(0.1, 4, s, q))
        np.testing.assert_array_equal(idx, 0)


class TestInterpolate:
    def test_three_nn(self, rng):
        unknown = rng.standard_normal((1, 50, 3)).astype(np.float32)
        known = rng.standard_normal((1, 20, 3)).astype(np.float32)
        d, i = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        d2 = np_pairwise_dist2(unknown[0], known[0])
        ref_i = np.argsort(d2, axis=1)[:, :3]
        ref_d = np.sqrt(np.take_along_axis(d2, ref_i, axis=1))
        np.testing.assert_allclose(np.asarray(d)[0], ref_d, atol=1e-3)

    def test_weights_sum_to_one_inside_interpolation(self, rng):
        unknown = rng.standard_normal((1, 50, 3)).astype(np.float32)
        known = rng.standard_normal((1, 20, 3)).astype(np.float32)
        feats = np.ones((1, 20, 4), dtype=np.float32)
        out = ops.three_interpolation(jnp.asarray(unknown), jnp.asarray(known),
                                      jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_exact_point_recovers_feature(self, rng):
        known = rng.standard_normal((1, 20, 3)).astype(np.float32)
        feats = rng.standard_normal((1, 20, 6)).astype(np.float32)
        out = ops.three_interpolation(jnp.asarray(known), jnp.asarray(known),
                                      jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(out), feats, atol=1e-4)

    def test_gradients_flow(self, rng):
        unknown = jnp.asarray(rng.standard_normal((1, 30, 3)).astype(np.float32))
        known = jnp.asarray(rng.standard_normal((1, 10, 3)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((1, 10, 4)).astype(np.float32))

        def loss(f):
            return jnp.sum(ops.three_interpolation(unknown, known, f) ** 2)

        g = jax.grad(loss)(feats)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


class TestGrouping:
    def test_grouping_operation(self, rng):
        pts = rng.standard_normal((2, 30, 5)).astype(np.float32)
        idx = rng.integers(0, 30, (2, 10, 4))
        out = np.asarray(ops.grouping_operation(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(out[b], pts[b][idx[b]], atol=0)

    def test_gather_points(self, rng):
        pts = rng.standard_normal((2, 30, 5)).astype(np.float32)
        idx = rng.integers(0, 30, (2, 7))
        out = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(out[b], pts[b][idx[b]], atol=0)


class TestScatter:
    def test_segment_mean(self, rng):
        data = rng.standard_normal((20, 4)).astype(np.float32)
        ids = rng.integers(0, 5, 20)
        out = np.asarray(ops.segment_mean(jnp.asarray(data), jnp.asarray(ids), 5))
        for c in range(5):
            if (ids == c).any():
                np.testing.assert_allclose(out[c], data[ids == c].mean(0), atol=1e-5)


class TestVectorAttn:
    def test_subtraction(self, rng):
        f1 = rng.standard_normal((1, 10, 4)).astype(np.float32)
        f2 = rng.standard_normal((1, 10, 4)).astype(np.float32)
        idx = rng.integers(0, 10, (1, 10, 3))
        out = np.asarray(ops.subtraction(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(idx)))
        ref = f1[0][:, None, :] - f2[0][idx[0]]
        np.testing.assert_allclose(out[0], ref, atol=1e-6)

    def test_aggregation(self, rng):
        feat = rng.standard_normal((1, 10, 8)).astype(np.float32)
        idx = rng.integers(0, 10, (1, 10, 3))
        w = rng.standard_normal((1, 10, 3, 4)).astype(np.float32)  # share 2 channels
        out = np.asarray(ops.aggregation(jnp.asarray(feat), jnp.asarray(w), jnp.asarray(idx)))
        neigh = feat[0][idx[0]].reshape(10, 3, 4, 2)
        ref = (neigh * w[0][..., None]).sum(1).reshape(10, 8)
        np.testing.assert_allclose(out[0], ref, atol=1e-5)


class TestGridSubsample:
    def test_barycenters(self):
        pts = np.array([[0.0, 0, 0], [0.2, 0, 0], [5.0, 5, 5]], dtype=np.float32)
        sub = ops.grid_subsample(pts, sample_dl=1.0)
        assert sub.shape[0] == 2
        np.testing.assert_allclose(sorted(sub[:, 0].tolist()), [0.1, 5.0], atol=1e-6)

    def test_labels_majority(self):
        pts = np.zeros((4, 3), dtype=np.float32)
        labels = np.array([1, 1, 2, 1])
        sub, sub_l = ops.grid_subsample(pts, labels=labels, sample_dl=1.0, num_classes=3)
        assert sub_l.tolist() == [1]


class TestPallasFps:
    def test_interpret_mode_matches_oracle(self, rng):
        """The Pallas kernel (TPU production path) against the numpy oracle,
        via the Pallas interpreter so it runs in the CPU suite."""
        from geot_tpu.ops.fps import _fps_impl
        from geot_tpu.ops.pallas_fps import fps_pallas

        xyz = jnp.asarray(rng.standard_normal((2, 1030, 3)).astype(np.float32))
        a = np.asarray(fps_pallas(xyz, 40, interpret=True))
        b = np.asarray(_fps_impl(xyz, None, 40))
        np.testing.assert_array_equal(a, b)

    def test_duplicated_points_tiebreak(self, rng):
        """Clouds with exact duplicates (real scans have them): the kernel's
        masked-argmax tiebreak must match the oracle's smallest-index rule."""
        from geot_tpu.ops.fps import _fps_impl
        from geot_tpu.ops.pallas_fps import fps_pallas

        base = rng.standard_normal((1, 100, 3)).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([base, base[:, :60], base[:, :40]],
                                         axis=1))               # (1, 200, 3)
        a = np.asarray(fps_pallas(xyz, 32, interpret=True))
        b = np.asarray(_fps_impl(xyz, None, 32))
        np.testing.assert_array_equal(a, b)

    def test_interleave_width_invariance(self, rng):
        """Per-cloud results are independent of the interleave width G the
        kernel picks (G follows batch size: 1 for B=1, 3 for B=6, 4 for B=4
        after the divisibility-aware cost model) — each cloud's chain is
        data-independent of its program co-residents."""
        from geot_tpu.ops.pallas_fps import fps_pallas

        xyz = jnp.asarray(rng.standard_normal((6, 300, 3)).astype(np.float32))
        batched = np.asarray(fps_pallas(xyz, 24, interpret=True))     # G=3
        for b in range(6):                                            # G=1
            single = np.asarray(fps_pallas(xyz[b:b + 1], 24, interpret=True))
            np.testing.assert_array_equal(batched[b], single[0])
        quad = np.asarray(fps_pallas(xyz[:4], 24, interpret=True))    # G=4
        np.testing.assert_array_equal(batched[:4], quad)


class TestPallasKnnSmallK:
    def test_interpret_exact_match(self, rng):
        """Fused Pallas small-k kNN (TPU exact path) vs top_k, via the
        interpreter so it runs in the CPU suite."""
        from geot_tpu.ops.pallas_knn import knn_small_k_pallas

        q = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((2, 450, 3)).astype(np.float32))
        d_p, i_p = knn_small_k_pallas(q, s, 3, interpret=True)
        d_e, i_e = ops.knn(q, s, 3, exact=True, squared=True)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_e), atol=1e-5)

    def test_k1_and_k4(self, rng):
        from geot_tpu.ops.pallas_knn import knn_small_k_pallas

        q = jnp.asarray(rng.standard_normal((1, 130, 3)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((1, 200, 3)).astype(np.float32))
        for k in (1, 4):
            d_p, i_p = knn_small_k_pallas(q, s, k, interpret=True)
            d_e, i_e = ops.knn(q, s, k, exact=True, squared=True)
            np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))
            np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_e),
                                       atol=1e-5)

    def test_coincident_points_and_ties(self, rng):
        """The eval upsampler (engine/eval.py) relies on exact-zero distance
        for coincident points and lax.top_k's smallest-index tiebreak."""
        from geot_tpu.ops.pallas_knn import knn_small_k_pallas

        s = rng.standard_normal((1, 64, 3)).astype(np.float32)
        # support with duplicated points (tie candidates at equal distance)
        s = np.concatenate([s, s[:, :32]], axis=1)              # (1, 96, 3)
        q = jnp.asarray(s[:, :48])                              # queries ⊂ support
        s = jnp.asarray(s)
        d_p, i_p = knn_small_k_pallas(q, s, 3, interpret=True)
        d_e, i_e = ops.knn(q, s, 3, exact=True, squared=True)
        # nearest neighbour of a support-member query is itself at exactly 0,
        # and ties resolve to the smaller index in both paths
        assert np.all(np.asarray(d_p)[..., 0] == 0.0)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_e), atol=1e-6)

    def test_self_query(self, rng):
        from geot_tpu.ops.pallas_knn import knn_small_k_pallas

        x = jnp.asarray(rng.standard_normal((2, 160, 3)).astype(np.float32))
        d_p, i_p = knn_small_k_pallas(x, x, 2, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p)[..., 0],
                                      np.arange(160)[None].repeat(2, 0))
        assert np.all(np.asarray(d_p)[..., 0] == 0.0)


class TestEvalShapeThreeNNAgreement:
    """VERDICT r1 weak-8: the Pallas small-k path (TPU default) and the pure
    exact path must agree at ``engine/eval.py:_upsample_pred``'s exact shape
    regime — full-scan queries padded with zeros, the 16k sample as support,
    queries that coincide with support points (the sample IS a subset of the
    scan) and duplicated support points (ties)."""

    @pytest.mark.slow
    def test_pallas_matches_pure_at_eval_shapes(self, rng):
        from geot_tpu.ops.knn import _knn_single
        from geot_tpu.ops.pallas_knn import knn_small_k_pallas

        N_support, P_full, bucket = 4000, 5000, 2048  # scaled eval regime
        full = rng.standard_normal((P_full, 3)).astype(np.float32)
        # the sample is a subset of the scan + duplicated rows (ties)
        sample = full[rng.permutation(P_full)[:N_support]].copy()
        sample[50:60] = sample[40:50]                 # exact duplicates
        padded_len = -(-P_full // bucket) * bucket
        query = np.zeros((padded_len, 3), np.float32)  # zero padding like eval
        query[:P_full] = full

        q = jnp.asarray(query)[None]
        s = jnp.asarray(sample)[None]
        d_p, i_p = knn_small_k_pallas(q, s, 3, interpret=True)
        d_e, i_e = jax.vmap(lambda qq, ss: _knn_single(
            qq, ss, k=3, tile=2048, exact=True, recall_target=0.99))(q, s)
        assert np.array_equal(np.asarray(i_p), np.asarray(i_e))
        # d2 sums differ by the fma association order only (<= 1 ulp)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_e),
                                   rtol=3e-7, atol=1e-12)


class TestFPSStratified:
    def test_prefix_is_true_fps_and_rows_unique(self, rng):
        from geot_tpu.ops import fps, fps_stratified

        pts = jnp.asarray(rng.standard_normal((2, 500, 3)).astype(np.float32))
        idx = np.asarray(fps_stratified(pts, 256, 64))
        head = np.asarray(fps(pts, 64))
        np.testing.assert_array_equal(idx[:, :64], head)
        for b in range(2):
            assert len(set(idx[b])) == 256, "sample-without-replacement"

    def test_full_prefix_equals_fps(self, rng):
        from geot_tpu.ops import fps, fps_stratified

        pts = jnp.asarray(rng.standard_normal((1, 200, 3)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(fps_stratified(pts, 128, 128)),
                                      np.asarray(fps(pts, 128)))

    def test_tail_is_deterministic_fixed_permutation(self, rng):
        from geot_tpu.ops import fps_stratified

        pts = jnp.asarray(rng.standard_normal((1, 300, 3)).astype(np.float32))
        i1 = np.asarray(fps_stratified(pts, 200, 50))
        i2 = np.asarray(fps_stratified(pts, 200, 50))
        np.testing.assert_array_equal(i1, i2)

    def test_full_order_is_permutation_with_duplicate_points(self, rng):
        """A cloud with fewer distinct points than fps_prefix (a small scan
        upsampled with replacement — predict_scan always resamples) makes FPS
        repeat indices; the stratified full order must STILL be a permutation
        or the model's inverse scatter silently corrupts every prediction
        (round-3 review finding)."""
        from geot_tpu.ops import fps_stratified

        base = rng.standard_normal((8, 3)).astype(np.float32)
        pts = jnp.asarray(np.tile(base, (32, 1))[None])    # (1, 256, 3)
        order = np.asarray(fps_stratified(pts, 256, 64))   # prefix > distinct
        np.testing.assert_array_equal(np.sort(order[0]), np.arange(256))
        # distinct clouds keep the head-then-fill behaviour byte-identical
        from geot_tpu.ops import fps

        pts2 = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))
        order2 = np.asarray(fps_stratified(pts2, 256, 64))
        np.testing.assert_array_equal(order2[:, :64], np.asarray(fps(pts2, 64)))
        for b in range(2):
            np.testing.assert_array_equal(np.sort(order2[b]), np.arange(256))
