"""Fixed-shape point-cloud ops — the TPU-native replacement for the
reference's four native extension stacks:

- top-level ``pointops`` (offset-batched FPS / weighted FPS / heap kNN,
  reference ``pointops/functions/pointops.py:7-44``)
- top-level ``pointnet2`` (FPS / gather / three_nn / three_interpolate /
  ball_query / grouping, reference ``pointnet2/pointnet2_utils.py:48-288``)
- ``openpoints/cpp/pointnet2_batch`` and ``openpoints/cpp/pointops``
  (same op families + subtraction / aggregation)
- the external ``knn_cuda`` package (brute-force kNN).

Everything here takes and returns dense ``(B, N, ...)`` arrays with static
shapes so XLA can fuse through them; there is no ragged offset layout.
Gradients come from autodiff (no hand-written backward kernels).
"""
from .knn import knn, knn_point, pairwise_dist2
from .fps import fps_stratified, fps, fps_gather, fps_weighted
from .ball_query import ball_query
from .group import gather_points, grouping_operation, index_points
from .interpolate import three_nn, three_interpolate, three_interpolation
from .scatter import segment_mean, segment_max, segment_sum
from .vector_attn import subtraction, aggregation
from .subsample import grid_subsample, random_sample

__all__ = [
    "fps_stratified", "knn", "knn_point", "pairwise_dist2",
    "fps", "fps_gather", "fps_weighted",
    "ball_query",
    "gather_points", "grouping_operation", "index_points",
    "three_nn", "three_interpolate", "three_interpolation",
    "segment_mean", "segment_max", "segment_sum",
    "subtraction", "aggregation",
    "grid_subsample", "random_sample",
]
