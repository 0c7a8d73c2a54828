"""Mesh + sharding utilities.

The reference's only parallelism is torch DDP + SyncBN over NCCL
(``examples/segmentation/train.py:159-166``, ``openpoints/utils/dist_utils.py``).
The TPU-native equivalent needs no communication code at all: one jitted train
step over a ``Mesh``, with

- **dp**: batch axis sharded -> gradient all-reduce AND cross-replica
  batch-norm statistics fall out of GSPMD (BatchNorm reduces over the global
  batch, which IS SyncBN semantics);
- **tp**: attention qkv/proj and MLP fc1/fc2 kernels sharded column/row-wise
  (Megatron layout) -> XLA inserts the psums on ICI.
- **sp**: the POINT axis (axis 1 of every ``(B, N, ...)`` batch array)
  sharded -> the dense per-point stages (edge convs, FP MLPs, seg head — the
  FLOP bulk at 16k points) compute on N/sp points per device, and GSPMD
  all-gathers around the cross-point neighbour ops (FPS/kNN).  This is the
  sequence-parallel analogue for point clouds: a memory/compute scaling axis
  for clouds (or batches) too big for one chip, not a latency win at the
  flagship 16k serving point.

``shard_state``/``shard_batch`` place an existing pytree accordingly.
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: int | None = None, tp: int = 1,
              sp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    dp = dp if dp is not None else n // (tp * sp)
    assert dp * sp * tp == n, \
        f"dp({dp}) * sp({sp}) * tp({tp}) != n_devices({n})"
    dev_array = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(dev_array, axis_names=("dp", "sp", "tp"))


# Megatron-style tensor-parallel layout for the transformer blocks:
# column-parallel (shard output features) for qkv & fc1, row-parallel (shard
# input features) for proj & fc2.  Everything else is replicated.
_TP_RULES = [
    (re.compile(r".*attn.*qkv.*kernel"), P(None, "tp")),
    (re.compile(r".*attn.*proj.*kernel"), P("tp", None)),
    (re.compile(r".*mlp.*fc1.*kernel"), P(None, "tp")),
    (re.compile(r".*mlp.*fc2.*kernel"), P("tp", None)),
]


def param_sharding_rules(path: str, leaf, fsdp_dp: int = 0,
                         fsdp_min_size: int = 1 << 16) -> P:
    """tp placement for a parameter (or its optimizer moments — the regexes
    match anywhere in the state path, so optax mu/nu mirror their params).

    ``fsdp_dp > 1`` additionally shards the largest free axis of big arrays
    over the dp axis (ZeRO-3-style fully-sharded parameters: XLA all-gathers
    at use and reduce-scatters the gradient — no hand-written collectives,
    same GSPMD mechanism as the tp rules).  Arrays smaller than
    ``fsdp_min_size`` elements stay replicated: gathering a LayerNorm scale
    costs more latency than its shard saves in HBM.
    """
    dims = [None] * getattr(leaf, "ndim", 0)
    if getattr(leaf, "ndim", 0) >= 2:
        for pattern, spec in _TP_RULES:
            if pattern.match(path):
                dims = list(spec) + [None] * (leaf.ndim - len(spec))
                break
    if (fsdp_dp > 1 and getattr(leaf, "ndim", 0) >= 1
            and leaf.size >= fsdp_min_size):
        free = [ax for ax in range(leaf.ndim)
                if dims[ax] is None and leaf.shape[ax] % fsdp_dp == 0]
        if free:
            ax = max(free, key=lambda a: leaf.shape[a])
            dims[ax] = "dp"
    # canonical form: PartitionSpec equality does not strip trailing Nones,
    # so P(None, None) != P() — drop them (P() when fully replicated)
    while dims and dims[-1] is None:
        dims.pop()
    return P(*dims)


def auto_mesh(cfg, logger=None) -> Mesh | None:
    """Shared device-mesh selection policy for the training drivers
    (segmentation ``engine/train.py`` and generative ``engine/pretrain.py``).

    Reads ``cfg.distributed`` (``"auto"``/``True``/``False``), ``cfg.tp``,
    ``cfg.sp`` (point-axis sharding), and the train batch size
    (``batch_size_l`` falling back to ``batch_size``).  Under ``"auto"``,
    dp shrinks to the largest divisor of the batch so every device holds
    whole samples (replicated compute helps nobody).  Returns the mesh, or
    ``None`` for single-device runs."""
    import jax

    devices = jax.devices()
    distributed = cfg.get("distributed", "auto")
    if len(devices) <= 1 or distributed is False:
        return None
    tp = int(cfg.get("tp", 1) or 1)
    sp = int(cfg.get("sp", 1) or 1)
    if tp * sp > 1 and len(devices) % (tp * sp):
        # an explicit tensor/point-parallel request that cannot be honoured
        # must not silently degrade to fewer devices (or single-device)
        raise ValueError(f"cfg.tp={tp} * cfg.sp={sp} does not divide the "
                         f"{len(devices)}-device count")
    dp = len(devices) // (tp * sp)
    bs = int(cfg.get("batch_size_l", cfg.get("batch_size", 0)) or 0)
    if jax.process_count() > 1:
        # multi-process: the mesh must span EVERY process's devices — a
        # shrunken mesh would leave some hosts owning zero mesh devices
        # (their host-local batch shards would have nowhere to go)
        if bs and bs % dp:
            raise ValueError(
                f"multi-host run: global batch {bs} must be divisible by "
                f"dp={dp} (= {len(devices)} devices / tp*sp={tp * sp})")
    elif distributed == "auto" and bs:
        while dp > 1 and bs % dp:
            dp -= 1
    if dp * sp * tp <= 1:
        return None
    mesh = make_mesh(devices[:dp * sp * tp], dp=dp, tp=tp, sp=sp)
    if logger is not None:
        logger.info(f"mesh: dp={dp} sp={sp} tp={tp} over "
                    f"{dp * sp * tp}/{len(devices)} "
                    f"{devices[0].platform} devices, "
                    f"{jax.process_count()} host(s)")
        for key in ("batch_size_l", "batch_size_u", "batch_size"):
            b = cfg.get(key)
            if b and int(b) % dp != 0:
                logger.warning(f"{key}={b} not divisible by dp={dp}; those "
                               "batches will be replicated, not dp-sharded")
    return mesh


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def shard_params(params, mesh: Mesh, fsdp: bool = False,
                 fsdp_min_size: int = 1 << 16):
    """Alias of ``shard_state`` for bare variable trees (one placement
    policy — keep the two call paths in lockstep)."""
    return shard_state(params, mesh, fsdp=fsdp, fsdp_min_size=fsdp_min_size)


def shard_state(state: Any, mesh: Mesh, fsdp: bool = False,
                fsdp_min_size: int = 1 << 16):
    """Place a TrainState/SemiTrainState: params (and matching optimizer
    moments) by the tp rules — plus dp-sharded under ``fsdp`` — everything
    else replicated."""
    fdp = mesh.shape["dp"] if fsdp else 0

    def place(path, leaf):
        p = _path_str(path)
        spec = param_sharding_rules(p, leaf, fsdp_dp=fdp,
                                    fsdp_min_size=fsdp_min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


# NOTE: the reference's ``reduce_tensor``/``gather_tensor`` all-reduce helpers
# (``openpoints/utils/dist_utils.py:30-44``) have no equivalent here on
# purpose: under GSPMD-sharded jit, gradient/metric reductions over the dp
# axis are already global — XLA inserts the collectives.


def get_dist_info():
    """``(rank, world_size)`` of this host — reference
    ``openpoints/utils/dist_utils.py:14`` (``get_dist_info``).  The JAX
    equivalents are process index/count: per-device parallelism lives in the
    mesh, not in per-process ranks."""
    import jax

    return jax.process_index(), jax.process_count()


def find_free_port() -> int:
    """Free localhost TCP port, for a ``jax.distributed.initialize``
    coordinator on single-node multi-process launches — reference
    ``dist_utils.py:46`` (used for the ``mp.spawn`` rendezvous)."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def shard_batch(batch, mesh: Mesh, host_local: bool = False):
    """Shard every array's leading (batch) axis over dp, and — when the mesh
    has an ``sp`` axis of size > 1 — its second (point) axis over sp.

    Axes that do not divide their mesh-axis size are replicated instead
    (e.g. a short final eval batch over dp, or ``(B, 1)`` jaw-class /
    ``(B, 17)`` class-weight arrays over sp) — correct, just without the
    sharding speedup for that array.

    ``host_local=True`` is the multi-process path (reference
    ``DistributedSampler``, ``openpoints/dataset/build.py:107``): each
    process passes its HOST-LOCAL slice of the global batch (the per-host
    loader shard) and the global array is assembled across processes with
    ``jax.make_array_from_process_local_data`` — the global batch axis is
    ``local_B * process_count``.  With the default ``host_local=False``
    every process must hold the identical global batch (single-process, or
    replicated eval batches)."""
    dp = mesh.shape["dp"]
    sp = mesh.shape.get("sp", 1)
    nproc = jax.process_count() if host_local else 1

    def place(leaf):
        ndim = getattr(leaf, "ndim", 0)
        dims = [None] * ndim
        global_b = leaf.shape[0] * nproc if ndim >= 1 else 0
        if ndim >= 1 and global_b % dp == 0:
            dims[0] = "dp"
        elif ndim >= 1 and host_local and nproc > 1:
            # replicating across processes would need an all-gather of
            # differing host data — a config error, refuse loudly.
            # 0-dim leaves (lr, epoch counters) skip this: identical
            # scalars replicate safely on every host.
            raise ValueError(
                f"multi-host batch axis {global_b} (= {leaf.shape[0]} "
                f"local x {nproc} processes) does not divide dp={dp}; "
                "pick a global batch size divisible by dp")
        if sp > 1 and ndim >= 2 and leaf.shape[1] % sp == 0:
            dims[1] = "sp"
        while dims and dims[-1] is None:
            dims.pop()
        sharding = NamedSharding(mesh, P(*dims))
        if host_local and nproc > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(leaf))
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, batch)
