from .adahessian import adahessian, hutchinson_diag
from .factory import (PlateauSchedule, build_optimizer_from_cfg,
                      build_scheduler_from_cfg)

__all__ = ["build_optimizer_from_cfg", "build_scheduler_from_cfg",
           "adahessian", "hutchinson_diag", "PlateauSchedule"]
