"""Cluster-contrast loss tests (reference P23)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.losses.cluster_contrast import (ClassContrastState,
                                              class_contrast_loss)

C, D, B, N = 5, 8, 2, 64


@pytest.fixture
def data(rng):
    feats = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, C, (B, N)))
    pred = jnp.asarray(rng.integers(0, C, (B, N)))
    conf = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
    return feats, pred, label, conf


def test_class_variant(data):
    feats, pred, label, conf = data
    state = ClassContrastState.create(jax.random.PRNGKey(0), C, D, queue_size=20)
    loss, new_state = class_contrast_loss(state, jax.random.PRNGKey(1), feats,
                                          pred, label, num_classes=C, n_view=16)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(new_state.centers), np.asarray(state.centers))
    assert not np.allclose(np.asarray(new_state.queues), np.asarray(state.queues))
    norms = np.linalg.norm(np.asarray(new_state.centers), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_subclass_variant(data):
    feats, pred, label, conf = data
    K = 3
    state = ClassContrastState.create(jax.random.PRNGKey(0), C * K, D, queue_size=20)
    loss, new_state = class_contrast_loss(state, jax.random.PRNGKey(1), feats,
                                          pred, label, conf=conf,
                                          num_classes=C, n_view=18, subclasses=K)
    assert np.isfinite(float(loss))
    assert new_state.centers.shape == (C * K, D)


def test_subclass_t_variant(data):
    feats, pred, label, conf = data
    t_feats = feats + 0.01
    state = ClassContrastState.create(jax.random.PRNGKey(0), C, D, queue_size=20)
    loss, _ = class_contrast_loss(state, jax.random.PRNGKey(1), feats, pred,
                                  label, num_classes=C, n_view=16,
                                  teacher_feats=t_feats)
    assert np.isfinite(float(loss))


def test_gradients_only_through_features(data):
    feats, pred, label, conf = data
    state = ClassContrastState.create(jax.random.PRNGKey(0), C, D, queue_size=20)

    def f(x):
        loss, _ = class_contrast_loss(state, jax.random.PRNGKey(1), x, pred,
                                      label, num_classes=C, n_view=16)
        return loss

    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_jittable(data):
    feats, pred, label, conf = data
    state = ClassContrastState.create(jax.random.PRNGKey(0), C, D, queue_size=20)
    f = jax.jit(lambda s, r, x, p, l: class_contrast_loss(
        s, r, x, p, l, num_classes=C, n_view=16))
    loss, _ = f(state, jax.random.PRNGKey(1), feats, pred, label)
    assert np.isfinite(float(loss))
