from .registry import Registry, build_from_cfg
from .config import EasyConfig
from .metrics import AverageMeter, ConfusionMatrix, get_mious
from .logger import setup_logger_dist, generate_exp_directory, resume_exp_directory
from .random import set_random_seed

__all__ = [
    "Registry",
    "build_from_cfg",
    "EasyConfig",
    "AverageMeter",
    "ConfusionMatrix",
    "get_mious",
    "setup_logger_dist",
    "generate_exp_directory",
    "resume_exp_directory",
    "set_random_seed",
]
