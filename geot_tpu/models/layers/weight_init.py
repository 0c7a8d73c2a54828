"""Weight-init utilities (reference ``openpoints/models/layers/weight_init.py``,
exported at ``layers/__init__.py:1``).

The reference functions mutate torch tensors in place; the JAX equivalents are
pure samplers ``fn(key, shape, ...) -> array`` with the same distributions:

- ``trunc_normal_``: inverse-CDF truncated normal, exactly the reference's
  ``_no_grad_trunc_normal_`` construction (``weight_init.py:8-44``) —
  uniform in [cdf(a), cdf(b)] -> erfinv -> scale/shift -> clamp.
- ``variance_scaling_``: fan-scaled normal / truncated-normal / uniform
  (``weight_init.py:65-85``).  Fan follows the torch convention the reference
  operates under: for an N-D kernel, ``fan_in = shape[1] * prod(shape[2:])``
  and ``fan_out = shape[0] * prod(shape[2:])`` — NOTE this differs from flax's
  (in, out)-trailing Dense layout; pass ``fan_axes="flax"`` to use
  ``fan_in = prod(shape[:-1])`` / ``fan_out = shape[-1]`` for flax kernels.
- ``lecun_normal_``: variance scaling, fan_in, truncated normal
  (``weight_init.py:88``).

Each also accepts an existing array instead of ``shape`` (its shape/dtype are
taken), mirroring the reference's tensor-argument call shape.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _shape_dtype(shape_or_array, dtype):
    if hasattr(shape_or_array, "shape"):
        return tuple(shape_or_array.shape), (dtype or shape_or_array.dtype)
    return tuple(shape_or_array), (dtype or jnp.float32)


def trunc_normal_(key, shape, mean: float = 0.0, std: float = 1.0,
                  a: float = -2.0, b: float = 2.0, dtype=None):
    """Truncated normal via the reference's inverse-CDF method
    (``weight_init.py:8-62``); ``a``/``b`` are ABSOLUTE truncation bounds
    (torch semantics), i.e. the defaults truncate N(0, 1) at ±2."""
    shape, dtype = _shape_dtype(shape, dtype)

    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    lo = norm_cdf((a - mean) / std)
    up = norm_cdf((b - mean) / std)
    # uniform in [2 lo - 1, 2 up - 1], erfinv, then scale by std*sqrt(2)+mean
    u = jax.random.uniform(key, shape, jnp.float32,
                           2 * lo - 1 + 1e-7, 2 * up - 1 - 1e-7)
    x = jax.scipy.special.erfinv(u)
    x = x * (std * math.sqrt(2.0)) + mean
    x = jnp.clip(x, a, b)
    return x.astype(dtype)


def _fans(shape, fan_axes: str):
    if fan_axes == "flax":
        fan_in = int(jnp.prod(jnp.asarray(shape[:-1]))) if len(shape) > 1 else shape[0]
        fan_out = shape[-1]
    else:  # torch convention (reference _calculate_fan_in_and_fan_out)
        if len(shape) == 1:
            fan_in = fan_out = shape[0]
        else:
            rest = 1
            for s in shape[2:]:
                rest *= s
            fan_in = shape[1] * rest
            fan_out = shape[0] * rest
    return fan_in, fan_out


def variance_scaling_(key, shape, scale: float = 1.0, mode: str = "fan_in",
                      distribution: str = "normal", dtype=None,
                      fan_axes: str = "torch"):
    """Reference ``weight_init.py:65-85``."""
    shape, dtype = _shape_dtype(shape, dtype)
    fan_in, fan_out = _fans(shape, fan_axes)
    denom = {"fan_in": fan_in, "fan_out": fan_out,
             "fan_avg": (fan_in + fan_out) / 2}[mode]
    variance = scale / denom
    if distribution == "truncated_normal":
        # constant from scipy.stats.truncnorm.std(a=-2, b=2) (reference :79)
        std = math.sqrt(variance) / 0.87962566103423978
        return trunc_normal_(key, shape, std=std, dtype=dtype)
    if distribution == "normal":
        return (jax.random.normal(key, shape, jnp.float32)
                * math.sqrt(variance)).astype(dtype)
    if distribution == "uniform":
        bound = math.sqrt(3 * variance)
        return jax.random.uniform(key, shape, jnp.float32,
                                  -bound, bound).astype(dtype)
    raise ValueError(f"invalid distribution {distribution}")


def lecun_normal_(key, shape, dtype=None, fan_axes: str = "torch"):
    """Reference ``weight_init.py:88``: fan_in truncated normal."""
    return variance_scaling_(key, shape, mode="fan_in",
                             distribution="truncated_normal", dtype=dtype,
                             fan_axes=fan_axes)
