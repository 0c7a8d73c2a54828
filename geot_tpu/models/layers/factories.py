"""Config-driven layer factories — the reference's public layer-building API.

``create_act`` / ``create_norm`` / ``create_convblock1d`` /
``create_convblock2d`` / ``create_linearblock`` mirror
``openpoints/models/layers/{activation.py:25,norm.py:74,conv.py:24-145}``:
``norm_args``/``act_args`` are either a name string or a
``{"norm"/"act": name, **kwargs}`` dict, ``None`` (or a missing name) means
"no layer", and a present norm drops the conv/linear bias exactly like the
reference (``conv.py:30-31``).

TPU redesign notes (why this file is much smaller than its counterparts):

- channels-last collapses the torch layout zoo: ``Conv1d(k=1)``,
  ``Conv2d(k=1)`` and ``Linear`` are all ``nn.Dense`` on the trailing axis,
  so the three block factories share one module and ``dimension`` is kept
  only to resolve the reference's ``"bn"``/``"ln"`` + dimension aliases.
- ``bn/bn1d/bn2d/fastbn*`` are all BatchNorm over the last axis, and
  ``syncbn`` is the SAME layer: under a dp-sharded jit the batch statistics
  are global by construction (see ``PointBatchNorm``), which is what
  ``SyncBatchNorm.convert_sync_batchnorm`` (reference ``train.py:160``)
  achieves with a dedicated module + collective.
- ``in1d/in2d`` (InstanceNorm) = GroupNorm with one group per channel;
  ``ln/ln1d/ln2d`` = LayerNorm on the trailing axis (the reference's 1d/2d
  variants only exist to permute around channels-first storage).
- activations map to ``jax.nn`` functions; ``inplace`` is accepted and
  ignored (a functional tracer has no in-place story).  ``prelu`` returns a
  flax module because it carries a parameter.
"""
from __future__ import annotations

import copy
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import PointBatchNorm

__all__ = ["create_act", "create_norm", "create_convblock1d",
           "create_convblock2d", "create_linearblock",
           "CreateResConvBlock2D", "Conv1d", "Conv2d"]


_ACT_FNS: dict = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": jax.nn.mish,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "leakyrelu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    "gelu": functools.partial(nn.gelu, approximate=False),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "hard_swish": jax.nn.hard_swish,
}


def create_act(act_args) -> Optional[Callable]:
    """Activation from a name or ``{"act": name, **kwargs}`` dict
    (reference ``activation.py:25-53``).  Returns a callable (or a flax
    module for ``prelu``), or ``None``."""
    if act_args is None:
        return None
    if isinstance(act_args, str):
        act_args = {"act": act_args}
    act_args = dict(act_args)
    act = act_args.pop("act", None)
    if act is None:
        return None
    act = act.lower()
    act_args.pop("inplace", None)  # meaningless under jit; reference default
    if act == "prelu":
        return nn.PReLU(**act_args)
    if act not in _ACT_FNS:
        raise ValueError(f"activation '{act}' is not supported "
                         f"(known: {sorted(_ACT_FNS)} + prelu)")
    fn = _ACT_FNS[act]
    if act in ("leaky_relu", "leakyrelu") and "negative_slope" in act_args:
        fn = functools.partial(fn, negative_slope=act_args.pop("negative_slope"))
    if act_args:
        fn = functools.partial(fn, **act_args)
    return fn


_BN_NAMES = {"bn", "bn1d", "bn2d", "syncbn", "fastbn", "fastbn1d", "fastbn2d"}
_LN_NAMES = {"ln", "ln1d", "ln2d"}
_IN_NAMES = {"in1d", "in2d"}


def create_norm(norm_args, channels: Optional[int] = None,
                dimension=None) -> Optional[nn.Module]:
    """Normalization module from a name or ``{"norm": name, **kwargs}`` dict
    (reference ``norm.py:74-97``).  ``channels`` is only needed for
    InstanceNorm (flax infers features at call time); ``dimension`` resolves
    the reference's ``norm + dimension`` aliasing and nothing else."""
    if norm_args is None:
        return None
    if isinstance(norm_args, dict):
        norm_args = copy.deepcopy(dict(norm_args))
        norm = norm_args.pop("norm", None)
    else:
        norm, norm_args = norm_args, {}
    if norm is None:
        return None
    norm = norm.lower()
    if dimension is not None and str(dimension).lower() not in norm:
        norm += str(dimension).lower()  # reference alias rule, norm.py:91-94
    eps = norm_args.pop("eps", 1e-5)
    if norm in _BN_NAMES:
        # torch momentum m keeps (1-m) of the running stat; flax keeps m
        torch_momentum = norm_args.pop("momentum", 0.1)
        return PointBatchNorm(momentum=1.0 - torch_momentum, epsilon=eps)
    if norm in _LN_NAMES:
        return nn.LayerNorm(epsilon=eps, **norm_args)
    if norm == "gn":
        return nn.GroupNorm(num_groups=norm_args.pop("num_groups", 32),
                            epsilon=eps, **norm_args)
    if norm in _IN_NAMES:
        if channels is None:
            raise ValueError("InstanceNorm needs `channels` "
                             "(one group per channel)")
        return nn.GroupNorm(num_groups=channels, epsilon=eps,
                            use_bias=False, use_scale=False, **norm_args)
    raise ValueError(f"norm '{norm}' is not supported "
                     f"(known: {sorted(_BN_NAMES | _LN_NAMES | _IN_NAMES)} + gn)")


class _DenseBlock(nn.Module):
    """Dense + norm + act in a configurable ``order`` — the channels-last
    equivalent of the reference's ``nn.Sequential`` conv blocks
    (``conv.py:24-145``; all its convs on point clouds are k=1)."""

    features: int
    norm: Any = None            # unbound flax module, adopted as 'norm'
    act: Any = None             # callable or unbound flax module
    order: str = "conv-norm-act"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.order not in ("conv-norm-act", "norm-act-conv",
                              "conv-act-norm"):
            raise NotImplementedError(f"{self.order} is not supported")

        def norm_(y):
            if self.norm is None:
                return y
            if isinstance(self.norm, PointBatchNorm):
                return self.norm(y, training=training)
            return self.norm(y)

        def act_(y):
            return y if self.act is None else self.act(y)

        def conv_(y):
            return nn.Dense(self.features, use_bias=self.use_bias,
                            dtype=self.dtype, name="conv")(y)

        steps = {"conv-norm-act": (conv_, norm_, act_),
                 "norm-act-conv": (norm_, act_, conv_),
                 "conv-act-norm": (conv_, act_, norm_)}[self.order]
        for f in steps:
            x = f(x)
        return x


def _make_block(in_channels, out_channels, *extra, norm_args=None,
                act_args=None, order="conv-norm-act", dimension=None,
                **kwargs) -> nn.Module:
    ks = kwargs.pop("kernel_size", extra[0] if extra else 1)
    if ks not in (1, (1,), (1, 1)):
        raise NotImplementedError(
            f"kernel_size={ks}: the point-cloud conv blocks are pointwise "
            f"(k=1) — spatial convs have no (B, N, C) meaning; use "
            f"flax nn.Conv directly for image decoders")
    bias = kwargs.pop("bias", True)
    dtype = kwargs.pop("dtype", None)
    if kwargs:
        raise TypeError(f"unsupported conv-block kwargs: {sorted(kwargs)}")
    # norm channel count: output for conv-first orders, input otherwise
    # (reference conv.py:30,41)
    norm_ch = in_channels if order == "norm-act-conv" else out_channels
    norm = create_norm(norm_args, norm_ch, dimension=dimension)
    act = create_act(act_args)
    if norm is not None:
        bias = False  # reference drops the bias under a norm (conv.py:31)
    return _DenseBlock(features=out_channels, norm=norm, act=act,
                       order=order, use_bias=bias, dtype=dtype)


def create_convblock1d(*args, norm_args=None, act_args=None,
                       order="conv-norm-act", **kwargs) -> nn.Module:
    """Reference ``conv.py:66`` — pointwise Conv1d block on (B, N, C)."""
    return _make_block(*args, norm_args=norm_args, act_args=act_args,
                       order=order, dimension="1d", **kwargs)


def create_convblock2d(*args, norm_args=None, act_args=None,
                       order="conv-norm-act", **kwargs) -> nn.Module:
    """Reference ``conv.py:24`` — pointwise Conv2d block on (B, G, K, C)."""
    return _make_block(*args, norm_args=norm_args, act_args=act_args,
                       order=order, dimension="2d", **kwargs)


def create_linearblock(*args, norm_args=None, act_args=None,
                       order="conv-norm-act", **kwargs) -> nn.Module:
    """Reference ``conv.py:106`` — Linear block (identical to the 1d conv
    block in channels-last form)."""
    return _make_block(*args, norm_args=norm_args, act_args=act_args,
                       order=order, dimension="1d", **kwargs)


class _PointwiseConv(nn.Module):
    """Channels-last stand-in for the reference's ``Conv1d``/``Conv2d``
    wrappers (``conv.py:8-22``): bare torch convs whose kernel size defaults
    to 1 when only (in, out) are given.  All point-cloud uses are pointwise,
    so this is a trailing-axis Dense; spatial kernels raise, pointing at
    ``flax.linen.Conv``."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=self.dtype, name="conv")(x)


def _pointwise_conv(in_channels, out_channels=None, kernel_size=1, *,
                    bias=True, dtype=None, **kwargs):
    if out_channels is None:
        out_channels = in_channels
    if kernel_size not in (1, (1,), (1, 1)):
        raise NotImplementedError(
            "spatial kernels have no (B, N, C) meaning — use flax nn.Conv")
    if kwargs:
        raise TypeError(f"unsupported conv kwargs: {sorted(kwargs)}")
    return _PointwiseConv(features=out_channels, use_bias=bias, dtype=dtype)


# reference ``conv.py:8-22``: Conv2d/Conv1d(in, out) default to kernel 1
Conv1d = _pointwise_conv
Conv2d = _pointwise_conv


class CreateResConvBlock2D(nn.Module):
    """Residual stack of 2d conv blocks (reference ``conv.py:149-167``):
    ``mlps[i] -> mlps[i+1]`` blocks with act for i < len-2, a final block
    WITHOUT activation, then ``act(convs(x) + (res or x))``."""

    mlps: Any                      # sequence of channel widths
    norm_args: Any = None
    act_args: Any = None
    order: str = "conv-norm-act"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, res=None, training: bool = False):
        mlps = list(self.mlps)
        y = x
        for i in range(len(mlps) - 2):
            y = create_convblock2d(mlps[i], mlps[i + 1],
                                   norm_args=self.norm_args,
                                   act_args=self.act_args, order=self.order,
                                   dtype=self.dtype)(y, training=training)
        y = create_convblock2d(mlps[-2], mlps[-1], norm_args=self.norm_args,
                               act_args=None, dtype=self.dtype)(
            y, training=training)
        act = create_act(self.act_args)
        out = y + (x if res is None else res)
        return act(out) if act is not None else out
