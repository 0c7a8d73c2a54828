"""AOT model export for serving.

The reference has no deployment story (a checkpoint + the full python stack is
the only way to run inference).  Here the flagship forward can be exported as
a serialized StableHLO artifact via ``jax.export`` — loadable and callable
WITHOUT the model code, config system, or flax, and compiled ahead of time on
the serving host.  Pallas kernels (FPS / small-k kNN) are embedded as
platform-tagged Mosaic custom calls when exported on TPU.

Usage::

    from geot_tpu.engine.export import export_forward, load_forward
    path = export_forward(model, variables, n_points=16000, out="model.bin")
    fwd = load_forward("model.bin")          # serving side
    logits = fwd(pos, cls)                   # (B, N, 3), (B, 1) -> (B, N, C)
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_forward(model, variables, n_points: int = 16000, batch: int = 1,
                   out: str | None = None, embed_params: bool = True,
                   platforms=None) -> bytes | str:
    """Export ``model``'s forward to serialized StableHLO.

    Args:
        model: a built segmentor wrapper (e.g. ``WholePartSeg``).
        variables: its parameter pytree.
        embed_params: bake the weights into the artifact (self-contained
            serving blob); False keeps them as a runtime argument.
        out: file path; returns the path when given, else the raw bytes.
        platforms: lowering platforms (default: the current backend).
    """
    pos_spec = jax.ShapeDtypeStruct((batch, n_points, 3), jnp.float32)
    cls_spec = jax.ShapeDtypeStruct((batch, 1), jnp.int32)

    if embed_params:
        def fn(pos, cls):
            return model.apply(variables, {"pos": pos, "x": pos, "cls": cls})[0]

        exp = jexport.export(jax.jit(fn), platforms=platforms)(pos_spec,
                                                               cls_spec)
    else:
        def fn(v, pos, cls):
            return model.apply(v, {"pos": pos, "x": pos, "cls": cls})[0]

        var_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
        exp = jexport.export(jax.jit(fn), platforms=platforms)(var_spec,
                                                               pos_spec,
                                                               cls_spec)
    blob = exp.serialize()
    if out is None:
        return bytes(blob)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "wb") as f:
        f.write(blob)
    return out


def load_exported(src):
    """Deserialize to the ``jax.export.Exported`` object (callable via
    ``.call``; input specs in ``.in_avals`` — e.g. the baked point count)."""
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            blob = f.read()
    else:
        blob = src
    return jexport.deserialize(bytearray(blob))


def load_forward(src) -> Callable:
    """Deserialize an exported forward; returns a jittable callable."""
    return jax.jit(load_exported(src).call)


def export_cli(argv=None):
    """``python -m geot_tpu.engine.export --cfg <yaml> --ckpt <dir> --out <f>``:
    build the configured model, restore the checkpoint, export."""
    import argparse

    from ..core.config import EasyConfig
    from ..models import build_model_from_cfg
    from .checkpoint import load_variables

    p = argparse.ArgumentParser("geot_tpu AOT export")
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n_points", type=int, default=16000)
    p.add_argument("--batch", type=int, default=1)
    args, opts = p.parse_known_args(argv)
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update(opts)
    model = build_model_from_cfg(cfg.model)
    use_ema = cfg.get("use_ema", "auto")
    variables = load_variables(args.ckpt,
                               prefer_ema=("auto" if use_ema == "auto"
                                           else bool(use_ema)))
    path = export_forward(model, variables, n_points=args.n_points,
                          batch=args.batch, out=args.out)
    print(f"exported to {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    export_cli()
