"""Reusable NN layers — the public surface mirrors the reference's
``openpoints/models/layers/__init__.py`` export list name-for-name (plus this
rebuild's own additions), so reference-style imports work unchanged:

    from geot_tpu.models.layers import (trunc_normal_, DropPath, Mlp,
                                        create_convblock1d, fps, three_nn, ...)
"""
from .common import (MlpBlock, DropPath, PointBatchNorm, SharedMLP,
                     drop_path_rates, make_divisible)
from .helpers import (MultipleSequential, to_1tuple, to_2tuple, to_3tuple,
                      to_4tuple, to_ntuple)
from .weight_init import trunc_normal_, variance_scaling_, lecun_normal_
from .drop import DropBlock2d, drop_block_2d, drop_block_fast_2d, drop_path
from .mlp import Mlp, GluMlp, GatedMlp, ConvMlp
from .group_embed import SubsampleGroup, GroupTokenizer
from .patch_embed import PointPatchEmbed, P3Embed
from .knn import knn_point, KNN, DilatedKNN, DenseDilated
from .subsample import furthest_point_sample, random_sample
from .group import (create_grouper, QueryAndGroup, KNNGroup, GroupAll,
                    get_aggregation_features)
from .group import get_aggregation_features as get_aggregation_feautres  # noqa: E501  reference spelling (group.py:323)
from .local_aggregation import ASSA, LocalAggregation, CHANNEL_MAP
from .kmeans import kmeans, KMeansEmbed
from .attention import TransformerEncoder
from .graph_conv import (MRConv, EdgeConv, GraphConv, DynConv, ResDynBlock,
                         DenseDynBlock, gather_features)
from .factories import (create_act, create_norm, create_convblock1d,
                        create_convblock2d, create_linearblock,
                        CreateResConvBlock2D, Conv1d, Conv2d)
# op-level exports the reference republishes through models.layers
# (``layers/__init__.py:10-13``: group/subsample/upsampling wrappers).
# ``gather_operation`` is channels-last here (= ops.gather_points); the
# channels-first torch layout lives in ``ops.compat.pointnet2_utils``.
from ...ops import (fps, grouping_operation, three_nn,
                    three_interpolate, three_interpolation)
from ...ops import gather_points as gather_operation
from ...ops.group import torch_grouping_operation

__all__ = [
    "MlpBlock", "DropPath", "PointBatchNorm", "SharedMLP", "drop_path_rates",
    "make_divisible", "MultipleSequential",
    "to_1tuple", "to_2tuple", "to_3tuple", "to_4tuple", "to_ntuple",
    "trunc_normal_", "variance_scaling_", "lecun_normal_",
    "DropBlock2d", "drop_block_2d", "drop_block_fast_2d", "drop_path",
    "Mlp", "GluMlp", "GatedMlp", "ConvMlp",
    "SubsampleGroup", "GroupTokenizer", "PointPatchEmbed", "P3Embed",
    "knn_point", "KNN", "DilatedKNN", "DenseDilated",
    "furthest_point_sample", "random_sample",
    "create_grouper", "QueryAndGroup", "KNNGroup", "GroupAll",
    "get_aggregation_features", "get_aggregation_feautres",
    "ASSA", "LocalAggregation", "CHANNEL_MAP", "kmeans", "KMeansEmbed",
    "MRConv", "EdgeConv", "GraphConv", "DynConv", "ResDynBlock",
    "DenseDynBlock", "gather_features", "TransformerEncoder",
    "create_act", "create_norm", "create_convblock1d", "create_convblock2d",
    "create_linearblock", "CreateResConvBlock2D", "Conv1d", "Conv2d",
    "fps", "grouping_operation", "gather_operation", "torch_grouping_operation",
    "three_nn", "three_interpolate", "three_interpolation",
]
