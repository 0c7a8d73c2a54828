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


class DilatedKNN:
    """Dilated kNN (reference ``openpoints/models/layers/knn.py:91``):
    search k*d neighbours, keep every d-th (stochastic variant unsupported
    under jit determinism — uses the deterministic stride)."""

    def __init__(self, k: int, dilation: int = 1, **kwargs):
        self.k = k
        self.dilation = dilation

    def __call__(self, query, support=None):
        d, i = knn_point(self.k * self.dilation, query, support)
        return d[..., ::self.dilation], i[..., ::self.dilation]
