"""Reference-oracle parity for the cluster-contrast family (VERDICT r2 #6).

Loads ``utils/cluster_contrastloss.py`` as a torch oracle (cuda + torch_scatter
stubbed) and compares ``class_contrast_loss`` against the reference's
``nativeContrastLoss_class`` pieces under MATCHED sampling: every
(cloud, class) carries exactly n_view/2 hard and n_view/2 easy points, so both
implementations deterministically select the same anchor SET (both losses are
permutation-invariant in the anchors) and the loss/center updates must agree.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/utils/cluster_contrastloss.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geot_tpu.losses.cluster_contrast import (ClassContrastState,  # noqa: E402
                                              class_contrast_loss)

C, D, NV, Q = 17, 64, 100, 150
B = 2
N = C * NV     # every class: NV/2 hard + NV/2 easy per cloud


def _load_ref(monkeypatch):
    ts = types.ModuleType("torch_scatter")

    def scatter_mean(src, index, dim=0, dim_size=None):  # unused by _class
        raise NotImplementedError

    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_mean
    monkeypatch.setitem(sys.modules, "torch_scatter", ts)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    spec = importlib.util.spec_from_file_location("ref_ccl", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _data(seed):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((B, N, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    pred = np.zeros((B, N), np.int64)
    label = np.zeros((B, N), np.int64)
    for c in range(C):
        sl = slice(c * NV, (c + 1) * NV)
        pred[:, sl] = c
        label[:, sl.start:sl.start + NV // 2] = (c + 1) % C   # hard
        label[:, sl.start + NV // 2:sl.stop] = c              # easy
    return feats, pred, label


def test_class_contrast_matches_reference(monkeypatch):
    mod = _load_ref(monkeypatch)
    torch.manual_seed(0)
    ref = mod.nativeContrastLoss_class()

    feats, pred, label = _data(0)

    # ---- reference pieces, sequenced exactly like its forward ------------
    tX = torch.tensor(feats)
    # reference forward normalises then samples with (y_hat, y) roles
    X_, y_ = ref._assigning_subclass_labels(tX, torch.tensor(pred),
                                            torch.tensor(label))
    assert X_.shape[0] == B * C * NV, "matched sampling must keep every slot"
    ppc_ref = ref._ppc_contrastive_v1(X_, y_)
    pcc_ref = ref._pcc_contrastive(X_, y_)
    loss_ref = float(pcc_ref * 10 + ppc_ref)

    # reference center update (forward :381-391)
    for cls_id in range(C):
        cur = X_[(y_ == cls_id).squeeze(-1) if y_.ndim > 1 else (y_ == cls_id)]
        ref.new_cluster_center[cls_id] = cur.mean(0).detach()
    ref._update_operations()

    # ---- ours, seeded with the reference's initial state -----------------
    torch.manual_seed(0)
    init = mod.nativeContrastLoss_class()   # fresh copy of the same init
    state = ClassContrastState(
        centers=jnp.asarray(init.cluster_center.numpy()),
        queues=jnp.asarray(init.point_queue.numpy()),
        ptrs=jnp.zeros((C,), jnp.int32))

    loss_our, new_state = class_contrast_loss(
        state, jax.random.PRNGKey(0), jnp.asarray(feats),
        jnp.asarray(pred), jnp.asarray(label), num_classes=C, n_view=NV,
        temperature=0.1, mu=0.99, pixel_update=30, pcc_weight=10.0)

    assert float(loss_our) == pytest.approx(loss_ref, rel=2e-4), \
        (float(loss_our), loss_ref)
    np.testing.assert_allclose(np.asarray(new_state.centers),
                               ref.cluster_center.numpy(), atol=2e-5)


def test_queue_update_structure(monkeypatch):
    """Queue randomness can't be matched draw-for-draw; assert the structural
    contract instead: each prototype's pointer advances by pixel_update and
    the overwritten slots hold (normalised) features of that class."""
    feats, pred, label = _data(1)
    state = ClassContrastState.create(jax.random.PRNGKey(1), C, D, Q)
    _, new_state = class_contrast_loss(
        state, jax.random.PRNGKey(2), jnp.asarray(feats), jnp.asarray(pred),
        jnp.asarray(label), num_classes=C, n_view=NV, pixel_update=30)
    assert (np.asarray(new_state.ptrs) == 30).all()
    fn = np.asarray(jnp.asarray(feats) /
                    (jnp.linalg.norm(jnp.asarray(feats), axis=-1,
                                     keepdims=True) + 1e-12))
    for c in range(0, C, 5):
        rows = np.asarray(new_state.queues[c, :30])
        pool = fn[:, c * NV:(c + 1) * NV].reshape(-1, D)
        d = np.linalg.norm(rows[:, None] - pool[None], axis=-1).min(1)
        assert d.max() < 1e-5, f"class {c} enqueued foreign features"


def test_info_nce_invalid_slots_do_not_leak_into_negatives():
    """Fixed-shape validity (round-3 fix): padded slots with junk features
    must contribute neither positives nor negatives — the padded loss equals
    the compact valid-only loss exactly."""
    from geot_tpu.losses.cluster_contrast import _info_nce

    rng = np.random.default_rng(0)
    a = rng.standard_normal((10, 8)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    y = np.array([0, 0, 1, 1, 2, 2, 0, 1, 2, 2])
    v = np.array([True] * 6 + [False] * 4)
    a_junk = a.copy()
    a_junk[6:] *= 100.0          # junk magnitudes in the padded slots

    same = (y[:, None] == y[None, :]).astype(np.float32)
    pos_pad = same * (v[:, None] & v[None, :])
    padded = _info_nce(jnp.asarray(a_junk), jnp.asarray(a_junk),
                       jnp.asarray(pos_pad), contrast_valid=jnp.asarray(v),
                       drop_self=True, anchor_valid=jnp.asarray(v))

    same6 = (y[:6, None] == y[None, :6]).astype(np.float32)
    compact = _info_nce(jnp.asarray(a[:6]), jnp.asarray(a[:6]),
                        jnp.asarray(same6), drop_self=True)
    assert float(padded) == pytest.approx(float(compact), rel=1e-5)


def test_subclass_contrast_matches_reference(monkeypatch):
    """Quantile-binned subclass variant (reference
    ``nativeContrastLoss_subclass``, ``cluster_contrastloss.py:408-768``)
    under matched sampling: every (cloud, class) has 20 members with distinct
    confidences, so every K_split quantile bin holds <= n_view//K points and
    both implementations select ALL of them."""
    mod = _load_ref(monkeypatch)

    # real scatter_mean for the reference's center update (stub is a raiser)
    import sys

    def scatter_mean(src, index, dim=0, dim_size=None):
        out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
        cnt = torch.zeros(dim_size, dtype=src.dtype)
        out.index_add_(0, index, src)
        cnt.index_add_(0, index, torch.ones(len(index), dtype=src.dtype))
        return out / cnt.clamp(min=1).unsqueeze(-1)

    sys.modules["torch_scatter"].scatter_mean = scatter_mean
    mod.scatter_mean = scatter_mean

    K = 6
    P_PER = 20                     # members per (cloud, class)
    NB = C * P_PER                 # points per cloud
    rng_np = np.random.default_rng(3)
    feats = rng_np.standard_normal((B, NB, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    pred = np.zeros((B, NB), np.int64)
    cur = np.zeros((B, NB), np.float32)
    for c in range(C):
        sl = slice(c * P_PER, (c + 1) * P_PER)
        pred[:, sl] = c
        for bb in range(B):
            cur[bb, sl] = rng_np.permutation(P_PER) / P_PER + 0.01 * bb

    torch.manual_seed(1)
    ref = mod.nativeContrastLoss_subclass()
    X_, y_ = ref._assigning_subclass_labels_cur(
        torch.tensor(feats), torch.tensor(pred), torch.tensor(pred),
        torch.tensor(cur))
    assert X_.shape[0] == B * NB, "matched sampling must keep every point"
    ppc_ref = ref._ppc_contrastive_v1(X_, y_)
    pcc_ref = ref._pcc_contrastive(X_, y_)
    loss_ref = float(pcc_ref * 10 + ppc_ref)

    # reference center update (forward :736-747)
    cls_ids = (y_ // K).long()
    sub_ids = (y_ % K).long()
    for cls_id in range(C):
        m = cls_ids == cls_id
        ref.new_cluster_center[cls_id] = scatter_mean(
            X_[m], sub_ids[m], dim=0, dim_size=K).detach()
    ref._update_operations()

    torch.manual_seed(1)
    init = mod.nativeContrastLoss_subclass()
    state = ClassContrastState(
        centers=jnp.asarray(init.cluster_center.view(C * K, D).numpy()),
        queues=jnp.asarray(init.point_queue.numpy()),
        ptrs=jnp.zeros((C * K,), jnp.int32))
    loss_our, new_state = class_contrast_loss(
        state, jax.random.PRNGKey(5), jnp.asarray(feats), jnp.asarray(pred),
        jnp.asarray(pred), conf=jnp.asarray(cur), num_classes=C,
        n_view=16 * K, subclasses=K, temperature=0.1, mu=0.99,
        pixel_update=30, pcc_weight=10.0)

    assert float(loss_our) == pytest.approx(loss_ref, rel=2e-4), \
        (float(loss_our), loss_ref)
    np.testing.assert_allclose(
        np.asarray(new_state.centers).reshape(C, K, D),
        ref.cluster_center.numpy(), atol=2e-5)


def test_pcc_top2_matches_reference(monkeypatch):
    """The _t variant's ambiguous-point prototype term (reference
    ``_pcc_contrastive_top2``, ``cluster_contrastloss.py:1071-1113``) under
    matched sampling."""
    mod = _load_ref(monkeypatch)
    from geot_tpu.losses.cluster_contrast import pcc_top2_loss

    K = 6
    P_PER = 20
    NB = C * P_PER
    rng_np = np.random.default_rng(7)
    feats = rng_np.standard_normal((B, NB, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    label1 = np.zeros((B, NB), np.int64)
    cur = np.zeros((B, NB), np.float32)
    for c in range(C):
        sl = slice(c * P_PER, (c + 1) * P_PER)
        label1[:, sl] = c
        for bb in range(B):
            cur[bb, sl] = rng_np.permutation(P_PER) / P_PER + 0.003 * bb
    label2 = (label1 + 1) % C

    torch.manual_seed(2)
    ref = mod.nativeContrastLoss_subclass_t()
    X_, y1_, y2_ = ref._assigning_subclass_labels_cur_top2(
        torch.tensor(feats), torch.tensor(label1), torch.tensor(label2),
        torch.tensor(cur))
    assert X_.shape[0] == B * NB
    loss_ref = float(ref._pcc_contrastive_top2(X_, y1_, y2_))

    torch.manual_seed(2)
    init = mod.nativeContrastLoss_subclass_t()
    state = ClassContrastState(
        centers=jnp.asarray(init.cluster_center.view(C * K, D).numpy()),
        queues=jnp.asarray(init.point_queue.numpy()),
        ptrs=jnp.zeros((C * K,), jnp.int32))
    loss_our = pcc_top2_loss(
        state, jax.random.PRNGKey(9), jnp.asarray(feats),
        jnp.asarray(label1), jnp.asarray(label2),
        jnp.ones((B, NB), bool), jnp.asarray(cur), num_classes=C,
        subclasses=K, n_view=16 * K, temperature=0.1)
    assert float(loss_our) == pytest.approx(loss_ref, rel=2e-4), \
        (float(loss_our), loss_ref)


def test_pseudo_label_from_prototype_matches_reference(monkeypatch):
    mod = _load_ref(monkeypatch)
    from geot_tpu.losses.cluster_contrast import pseudo_label_from_prototype

    K = 6
    torch.manual_seed(3)
    ref = mod.nativeContrastLoss_subclass()
    state = ClassContrastState(
        centers=jnp.asarray(ref.cluster_center.view(C * K, D).numpy()),
        queues=jnp.zeros((C * K, 1, D)), ptrs=jnp.zeros((C * K,), jnp.int32))
    rng_np = np.random.default_rng(11)
    feats = rng_np.standard_normal((B, 256, D)).astype(np.float32)

    # reference expects channels-second (B, D, N)
    pl_ref, logit_ref = ref.pseudo_label_from_prototype(
        torch.tensor(feats).permute(0, 2, 1))
    pl, logit = pseudo_label_from_prototype(state, jnp.asarray(feats), C, K)
    np.testing.assert_array_equal(np.asarray(pl), pl_ref.numpy())
    np.testing.assert_allclose(np.asarray(logit), logit_ref.numpy(), atol=1e-5)
