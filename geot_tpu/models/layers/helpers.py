"""Layer/module helpers (reference ``openpoints/models/layers/helpers.py``).

``to_ntuple`` and friends are the torch-internals tuple parsers timm vendors;
``MultipleSequential`` is the reference's Sequential that threads MULTIPLE
values between stages (a stage returning a tuple feeds the next stage as
positional args) — here a flax module over an adopted list of children.
``make_divisible`` lives in :mod:`.common` and is re-exported for parity.
"""
from __future__ import annotations

import collections.abc
from itertools import repeat
from typing import Any, Sequence

import flax.linen as nn

from .common import make_divisible  # noqa: F401  (reference helpers.py:26)


def _ntuple(n):
    """Reference ``helpers.py:11`` (from torch internals)."""

    def parse(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_1tuple = _ntuple(1)
to_2tuple = _ntuple(2)
to_3tuple = _ntuple(3)
to_4tuple = _ntuple(4)
to_ntuple = _ntuple


class MultipleSequential(nn.Module):
    """Sequential that forwards tuples as positional args
    (reference ``helpers.py:36-43``).  ``layers`` is a sequence of flax
    modules or plain callables; a stage returning a tuple fans out into the
    next stage's arguments."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, *inputs):
        out: Any = inputs
        for layer in self.layers:
            out = layer(*out) if isinstance(out, tuple) else layer(out)
        return out
