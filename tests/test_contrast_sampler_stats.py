"""Statistical equivalence of the fixed-shape contrast sampler
(VERDICT r3 weak-#1): ``losses.cluster_contrast._sample_per_class`` vs the
reference's ragged ``_hard_anchor_sampling``
(``/root/reference/utils/cluster_contrastloss.py:55-110``).

The reference picks, per (cloud, class) with H hard / E easy candidates:
  - H >= n/2 and E >= n/2 -> n/2 hard + n/2 easy, uniform within groups
  - only E >= n/2         -> ALL hard + (n - H) easy
  - only H >= n/2         -> ALL easy + (n - E) hard
  - both < n/2            -> all H + E candidates (< n total)

The rebuild's gumbel-priority top-k must reproduce those COUNTS exactly for
every (H, E) regime and be uniform within groups.  These tests check both:
counts against a closed-form oracle on constructed scenarios, uniformity by
frequency over many rng draws.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.losses.cluster_contrast import _sample_per_class

C = 4            # classes
N = 64
N_VIEW = 8


def _reference_counts(H, E, n_view):
    """Closed-form (hard_keep, easy_keep) of the reference branch ladder.
    The min() reflects the reference's ``perm[:keep]`` silently clamping
    when the backfilled group is itself too small (e.g. H=3, E=4, n=8:
    branch asks for 8-3=5 easy but only 4 exist)."""
    half = n_view / 2
    if H >= half and E >= half:
        return n_view // 2, n_view - n_view // 2
    if H >= half:                       # easy scarce
        return min(H, n_view - E), E
    if E >= half:                       # hard scarce
        return H, min(E, n_view - H)
    return H, E                         # both scarce: keep everything


def _scenario(rng, H, E):
    """One cloud where class 1 has exactly H hard / E easy candidates."""
    pred = np.zeros((1, N), np.int32)
    label = np.zeros((1, N), np.int32)
    sel = rng.choice(N, H + E, replace=False)
    pred[0, sel] = 1                    # predicted class 1
    label[0, sel[:H]] = 2               # hard: pred 1, label != 1
    label[0, sel[H:]] = 1               # easy: pred 1, label 1
    return jnp.asarray(pred), jnp.asarray(label), sel


@pytest.mark.parametrize("H,E", [
    (20, 20),   # both plentiful
    (2, 30),    # hard scarce
    (30, 3),    # easy scarce
    (3, 2),     # both scarce (total < n_view)
    (3, 4),     # both scarce (total < n_view, uneven)
    (0, 20),    # no hard at all
    (20, 0),    # no easy at all
    (0, 0),     # class absent
    (4, 4),     # exactly at the half boundary
])
def test_counts_match_reference_branch_ladder(H, E):
    rng = np.random.default_rng(7)
    pred, label, sel = _scenario(rng, H, E)
    hard_set = set(sel[:H].tolist())
    easy_set = set(sel[H:].tolist())
    ref_h, ref_e = _reference_counts(H, E, N_VIEW)
    for trial in range(20):
        idx, valid = _sample_per_class(jax.random.PRNGKey(trial), pred, label,
                                       C, N_VIEW)
        idx_c = np.asarray(idx)[0, 1]
        val_c = np.asarray(valid)[0, 1]
        picked = idx_c[val_c]
        # valid slots are candidates, each picked at most once
        assert len(set(picked.tolist())) == len(picked)
        got_h = sum(1 for i in picked if i in hard_set)
        got_e = sum(1 for i in picked if i in easy_set)
        assert (got_h, got_e) == (ref_h, ref_e), \
            f"H={H} E={E}: got ({got_h},{got_e}) want ({ref_h},{ref_e})"
        # nothing outside the candidate sets is ever valid
        assert all(i in hard_set | easy_set for i in picked.tolist())


def test_within_group_selection_is_uniform():
    """Frequency of each hard candidate over many draws ~ keep/H (and same
    for easy): the reference's randperm-prefix is uniform within groups; the
    gumbel keys must be too.  4-sigma binomial tolerance."""
    H, E = 16, 24
    rng = np.random.default_rng(3)
    pred, label, sel = _scenario(rng, H, E)
    hard_ids, easy_ids = sel[:H], sel[H:]
    ref_h, ref_e = _reference_counts(H, E, N_VIEW)

    trials = 3000
    keys = jax.random.split(jax.random.PRNGKey(0), trials)
    sample = jax.jit(jax.vmap(
        lambda k: _sample_per_class(k, pred, label, C, N_VIEW)))
    idx, valid = sample(keys)
    idx_c = np.asarray(idx)[:, 0, 1]                 # (trials, n_view)
    val_c = np.asarray(valid)[:, 0, 1]
    counts = np.zeros(N)
    for t in range(trials):
        counts[idx_c[t][val_c[t]]] += 1

    for ids, keep, M in ((hard_ids, ref_h, H), (easy_ids, ref_e, E)):
        p = keep / M
        sigma = np.sqrt(trials * p * (1 - p))
        expected = trials * p
        dev = np.abs(counts[ids] - expected)
        assert dev.max() < 4.5 * sigma, \
            (f"non-uniform selection: max dev {dev.max():.1f} vs "
             f"4.5 sigma {4.5 * sigma:.1f} (expected {expected:.1f})")
    # non-candidates never selected as valid
    mask = np.ones(N, bool)
    mask[sel] = False
    assert counts[mask].sum() == 0
