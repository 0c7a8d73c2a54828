"""kNN layer wrappers (reference: ``openpoints/models/layers/knn.py:7,23,91``).

Thin functional wrappers over ``geot_tpu.ops.knn`` so model code reads like the
reference; the underlying search is the blockwise TPU kernel.
"""
from __future__ import annotations

from ...ops import knn as _ops_knn


def knn_point(k: int, query, support=None):
    """(dist, idx), euclidean ascending — ``knn_point``
    (reference ``openpoints/models/layers/knn.py:7``)."""
    if support is None:
        support = query
    return _ops_knn(query, support, k)


class KNN:
    """Callable matching the reference ``KNN`` module surface
    (``openpoints/models/layers/knn.py:23``) and the external ``knn_cuda.KNN``:
    configured with neighbour count, called with (query, support)."""

    def __init__(self, neighbors: int, farthest: bool = False, **kwargs):
        if farthest:
            raise NotImplementedError("farthest-neighbour mode is unused in GeoT")
        self.neighbors = neighbors

    def __call__(self, query, support=None):
        if support is None:
            support = query
        return _ops_knn(query, support, self.neighbors)


class DenseDilated:
    """Dilated-neighbour selector over a dense edge-index (B, N, k*d)
    (reference ``openpoints/models/layers/knn.py:65-88``): keep every d-th
    column, or — stochastic mode during training — a random k-subset of the
    k*d candidates with probability ``epsilon`` (one shared draw per call,
    exactly like the reference's single ``randperm``).  The torch version
    draws from the global RNG; pass ``rng`` (a ``jax.random`` key) to enable
    the stochastic branch under jit determinism."""

    def __init__(self, k: int = 9, dilation: int = 1,
                 stochastic: bool = False, epsilon: float = 0.0):
        self.k = k
        self.dilation = dilation
        self.stochastic = stochastic
        self.epsilon = epsilon

    def __call__(self, edge_index, rng=None, training: bool = False):
        if self.stochastic and training and rng is not None:
            import jax

            r_gate, r_perm = jax.random.split(rng)
            num = self.k * self.dilation
            randnum = jax.random.permutation(r_perm, num)[: self.k]
            strided = edge_index[..., :: self.dilation]
            import jax.numpy as jnp

            return jnp.where(jax.random.uniform(r_gate) < self.epsilon,
                             edge_index[..., randnum], strided)
        return edge_index[..., :: self.dilation]


class DilatedKNN:
    """Dilated kNN (reference ``openpoints/models/layers/knn.py:91``):
    search k*d neighbours, keep a dilated subset via :class:`DenseDilated`."""

    def __init__(self, k: int, dilation: int = 1, stochastic: bool = False,
                 epsilon: float = 0.0, **kwargs):
        self.k = k
        self.dilation = dilation
        self._dilated = DenseDilated(k, dilation, stochastic, epsilon)

    def __call__(self, query, support=None, rng=None, training: bool = False):
        d, i = knn_point(self.k * self.dilation, query, support)
        return (self._dilated(d, rng, training),
                self._dilated(i, rng, training))
