"""geot_tpu — a TPU-native rebuild of the GeoT semi-supervised tooth point-cloud
segmentation framework (reference: CUHK-AIM-Group/GeoT).

The reference is PyTorch + CUDA extensions (openpoints + pointops + pointnet2);
this package is JAX/XLA/Pallas end to end:

- ``geot_tpu.ops``      fixed-shape point-cloud kernels (FPS, kNN, ball query,
                        grouping, three_nn/three_interpolate, segment ops)
                        replacing the CUDA extension stacks
                        (reference: pointops/, pointnet2/, openpoints/cpp/*).
- ``geot_tpu.models``   flax.linen model zoo mirroring openpoints/models
                        (Point Transformer, PointNet++, PointMLP, DGCNN,
                        segmentation/classification/generation wrappers).
- ``geot_tpu.data``     datasets + host-side transform pipelines
                        (reference: openpoints/dataset, openpoints/transforms).
- ``geot_tpu.losses``   loss registry incl. the Poly1Focal family and the
                        GeoT manifold / contrastive losses
                        (reference: openpoints/loss/build.py, utils/*.py).
- ``geot_tpu.optim``    optax optimizer/scheduler factories
                        (reference: openpoints/optim, openpoints/scheduler).
- ``geot_tpu.engine``   jit-compiled train/eval loops + checkpointing
                        (reference: examples/segmentation/train.py).
- ``geot_tpu.parallel`` mesh/sharding utilities (replaces torch DDP/SyncBN).
- ``geot_tpu.core``     registry, config, logging, metrics infra
                        (reference: openpoints/utils).
"""

__version__ = "0.1.0"

from .core.registry import Registry, build_from_cfg  # noqa: F401
from .core.config import EasyConfig  # noqa: F401
