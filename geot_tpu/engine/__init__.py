from .state import SemiTrainState, TrainState
from .semi import (LABEL_PROJ, estimate_class_T, gaussian_prior_T,
                   ntm_update, pseudo_stats)

__all__ = [
    "SemiTrainState", "TrainState",
    "LABEL_PROJ", "estimate_class_T", "gaussian_prior_T", "ntm_update",
    "pseudo_stats",
]
