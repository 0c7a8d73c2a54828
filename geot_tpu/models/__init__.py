from .build import MODELS, build_model_from_cfg

# import for registration side effects
from . import backbone  # noqa: F401
from . import segmentation  # noqa: F401
from . import classification  # noqa: F401
from . import generation  # noqa: F401
from .layers import patch_embed  # noqa: F401

__all__ = ["MODELS", "build_model_from_cfg"]
