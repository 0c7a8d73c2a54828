"""Model registry (reference: ``openpoints/models/build.py:12-22``).

``build_model_from_cfg(cfg)`` returns a *constructed flax module* (not
initialised parameters): modules here are dataclass-like and cheap, parameters
are created explicitly with ``module.init(rng, ...)`` by the engine.
"""
from ..core.registry import Registry

MODELS = Registry("models")


def build_model_from_cfg(cfg, **default_args):
    return MODELS.build(cfg, **default_args)
