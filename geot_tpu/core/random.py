"""Seeding helpers. The reference seeds torch/numpy global RNG
(``openpoints/utils/random.py``); in JAX randomness is explicit PRNG keys, so
this module seeds numpy (host-side data pipeline) and hands out a root key."""
from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int = 0, deterministic: bool = False):
    random.seed(seed)
    np.random.seed(seed)
    return seed


def root_key(seed: int):
    import jax

    return jax.random.PRNGKey(seed)


def str2bool(v):
    """argparse boolean coercion (reference ``openpoints/utils/str2bool.py:3``)."""
    import argparse

    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")
