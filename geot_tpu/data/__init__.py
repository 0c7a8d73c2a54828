from .build import (DATASETS, build_dataloader_from_cfg,
                    build_semi_dataloader_from_cfg, build_dataset_from_cfg)
from .data_util import crop_pc, get_class_weights, get_features_by_keys, voxelize
from ..utils.vis3d import vis_multi_points, vis_points  # reference dataset/__init__ exports
from .transforms import DataTransforms, build_transforms_from_cfg, Compose

# registration side effects
from . import tooth_semi  # noqa: F401
from . import tooth_pretrain  # noqa: F401
from . import shapenetpart  # noqa: F401

__all__ = [
    "DATASETS", "build_dataloader_from_cfg", "build_semi_dataloader_from_cfg",
    "build_dataset_from_cfg", "get_class_weights", "get_features_by_keys",
    "crop_pc", "voxelize", "vis_points", "vis_multi_points",
    "DataTransforms", "build_transforms_from_cfg", "Compose",
]
