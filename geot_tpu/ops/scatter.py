"""Segment reductions — replacement for the external ``torch_scatter``
package (reference usage: ``examples/segmentation/train.py:16``,
``utils/cluster_contrastloss.py:6,743,1160`` for per-class cluster centers).

Thin wrappers over ``jax.ops.segment_*`` with a fixed ``num_segments`` so
shapes stay static under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    totals = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    counts = jax.ops.segment_sum(jnp.ones((data.shape[0],), data.dtype),
                                 segment_ids, num_segments=num_segments)
    return totals / jnp.maximum(counts, 1.0)[..., None] if data.ndim > 1 \
        else totals / jnp.maximum(counts, 1.0)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
