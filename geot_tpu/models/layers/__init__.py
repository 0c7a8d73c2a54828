from .common import MlpBlock, DropPath, PointBatchNorm, SharedMLP, drop_path_rates
from .group_embed import SubsampleGroup, GroupTokenizer
from .knn import knn_point, KNN, DilatedKNN
from .subsample import furthest_point_sample, random_sample
from .group import create_grouper, QueryAndGroup, KNNGroup, GroupAll, get_aggregation_features
from .local_aggregation import ASSA, LocalAggregation, CHANNEL_MAP
from .kmeans import kmeans
from .attention import TransformerEncoder
from .graph_conv import (MRConv, EdgeConv, GraphConv, DynConv, ResDynBlock,
                         DenseDynBlock)
from .factories import (create_act, create_norm, create_convblock1d,
                        create_convblock2d, create_linearblock)

__all__ = [
    "MlpBlock", "DropPath", "PointBatchNorm", "SharedMLP", "drop_path_rates",
    "SubsampleGroup", "GroupTokenizer",
    "knn_point", "KNN", "DilatedKNN",
    "furthest_point_sample", "random_sample",
    "create_grouper", "QueryAndGroup", "KNNGroup", "GroupAll",
    "get_aggregation_features",
    "ASSA", "LocalAggregation", "CHANNEL_MAP", "kmeans",
    "MRConv", "EdgeConv", "GraphConv", "DynConv", "ResDynBlock",
    "DenseDynBlock", "TransformerEncoder",
    "create_act", "create_norm", "create_convblock1d", "create_convblock2d",
    "create_linearblock",
]
