"""Fixed-iteration k-means (reference: ``openpoints/models/layers/kmeans.py``).

The reference loops until convergence with a dynamic tolerance check; under
jit the iteration count is static (``lax.fori_loop``), which is both
TPU-friendly and deterministic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from ...ops import pairwise_dist2


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x: jnp.ndarray, k: int, iters: int = 10, rng=None):
    """x (N, C) -> (assignments (N,), centers (k, C)).

    Initialisation: first k points (deterministic) or a random permutation
    when ``rng`` is given.
    """
    N, C = x.shape
    if rng is not None:
        init_idx = jax.random.choice(rng, N, (k,), replace=False)
    else:
        init_idx = jnp.arange(k)
    centers0 = x[init_idx]

    def body(_, centers):
        d2 = pairwise_dist2(x, centers)                  # (N, k)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        sums = onehot.T @ x
        counts = jnp.sum(onehot, axis=0)[:, None]
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)

    centers = lax.fori_loop(0, iters, body, centers0)
    assign = jnp.argmin(pairwise_dist2(x, centers), axis=1)
    return assign, centers


class KMeansEmbed(nn.Module):
    """Point cloud -> k-means groups -> per-cluster mini-PointNet tokens
    (reference ``openpoints/models/layers/kmeans.py:8-66``: MultiKMeans
    clustering + relative-xyz features + two Linear/LayerNorm stacks with a
    cluster-max readout between them).

    Returns ``(centroids (B, K, 3), out_features (B, K, D), p_i (B, N, 3),
    labels (B, N))`` like the reference forward."""

    num_groups: int = 256
    encoder_dim: int = 256
    feature_type: str = "dp"
    kmeans_iters: int = 10

    @nn.compact
    def __call__(self, xyz, features=None, training: bool = False):
        from ...ops import segment_max

        B, N, _ = xyz.shape
        K = self.num_groups
        labels, centroids = jax.vmap(
            lambda p: kmeans(p, K, iters=self.kmeans_iters))(xyz)
        p_i = jnp.take_along_axis(centroids, labels[..., None], axis=1)
        rel = xyz - p_i
        if self.feature_type == "dp":
            f = rel
        elif self.feature_type == "pj_dp":
            f = jnp.concatenate([xyz, rel], axis=-1)
        elif self.feature_type == "pi_dp":
            f = jnp.concatenate([p_i, rel], axis=-1)
        else:
            raise ValueError(f"feature_type {self.feature_type} unsupported "
                             f"(reference supports dp/pj_dp/pi_dp)")

        def mlp(x, widths, name):
            x = nn.Dense(widths[0], name=f"{name}_fc1")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln")(x)
            x = nn.relu(x)
            return nn.Dense(widths[1], name=f"{name}_fc2")(x)

        f = mlp(f, (128, 256), "conv1")                       # (B, N, 256)
        pooled = jax.vmap(lambda a, l: segment_max(a, l, K))(f, labels)
        rep = jnp.take_along_axis(pooled, labels[..., None], axis=1)
        f = jnp.concatenate([rep, f], axis=-1)                # (B, N, 512)
        f = mlp(f, (512, self.encoder_dim), "conv2")
        out = jax.vmap(lambda a, l: segment_max(a, l, K))(f, labels)
        return centroids, out, p_i, labels
