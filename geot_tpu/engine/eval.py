"""Full-resolution validation.

Reference ``validate``/``get_pred_whole``/``get_seg_metrics``
(``examples/segmentation/train.py:716-832``): predict on the 16k sample,
denormalise, three_nn + inverse-distance-interpolate the logits to the full
scan, then per-class IoU/DSC/ACC (gum class 0 excluded) split by jaw.

Full scans are ragged; each is padded to a bucket size (multiple of
``bucket``) so jit compiles once per bucket, and padded points are masked out
of the metrics.
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


from ..ops import three_nn


@jax.jit
def _upsample_pred(probs, pos, full_points, center, scale):
    """probs (N, C) softmax; pos (N, 3) normalised sample; full (P, 3) raw.
    Returns argmax predictions (P,) on the full scan."""
    pos_world = pos * scale + center
    dist, idx = three_nn(full_points[None], pos_world[None])
    dist, idx = dist[0], idx[0]
    recip = 1.0 / (dist + 1e-8)
    weight = recip / jnp.sum(recip, axis=1, keepdims=True)
    gathered = probs[idx]                                    # (P, 3, C)
    logit_whole = jnp.sum(gathered * weight[..., None], axis=1)
    return jnp.argmax(logit_whole, axis=-1)


def pad_to_bucket(points: np.ndarray, bucket: int) -> np.ndarray:
    """Zero-pad (P, 3) points to the next ``bucket`` multiple so the full-res
    upsample jit compiles once per bucket — the ONE padding rule shared by
    eval, predict_stream, and get_pred_whole (keep them in lockstep)."""
    P = len(points)
    padded = np.zeros((-(-P // bucket) * bucket, 3), dtype=np.float32)
    padded[:P] = points
    return padded


def get_pred_whole(logits, pos, full_points_list, centers, scales,
                   bucket: int = 8192, dtype=None) -> List[np.ndarray]:
    """Per-sample full-resolution predictions (reference ``train.py:781-800``).

    logits (B, N, C) raw; full_points_list: list of (P_i, 3) numpy arrays.
    ``dtype``: fetch the class ids in a narrower dtype (e.g. ``np.uint8`` —
    4x less D2H; all class counts here fit a byte).
    """
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    preds = []
    for i, full in enumerate(full_points_list):
        full = np.asarray(full, dtype=np.float32)
        P = len(full)
        padded = pad_to_bucket(full, bucket)
        args = (probs[i], jnp.asarray(pos[i]), jnp.asarray(padded),
                jnp.asarray(np.asarray(centers[i], dtype=np.float32)),
                jnp.asarray(np.float32(scales[i])))
        pred = (_upsample_pred(*args) if dtype is None
                else _upsample_pred_cast(*args, np.dtype(dtype).name))
        preds.append(np.asarray(pred)[:P])
    return preds


@functools.partial(jax.jit, static_argnums=(5,))
def _upsample_pred_cast(probs, pos, full_points, center, scale,
                        dtype_name: str):
    # one fused program (upsample + cast): the per-scan serving path must not
    # pay a second device-program dispatch just for the narrow-dtype fetch
    return _upsample_pred(probs, pos, full_points, center, scale).astype(
        dtype_name)


def tta_vote_logits(logits, pos_host, num_votes, transform, rng, run_on_pos):
    """Reference TTA-voting protocol (``train.py:365-375``): average softmax
    over ``num_votes`` extra passes on transformed positions, return averaged
    log-probs (argmax-equivalent logits).  Shared by ``validate`` and the
    predict/serve path so the protocol cannot diverge between evaluation and
    inference.  ``run_on_pos(pos) -> logits`` runs the forward on transformed
    positions of ``pos_host``'s shape.

    The transform sees ``pos_host`` exactly as the reference's voting does:
    the BATCHED (B, N, 3) tensor in ``validate`` (one random draw shared by
    the batch, like the reference applying ``voting_transform`` to the batch
    dict) and a single (N, 3) scan in predict/serve.  The shipped vote
    pipeline (``PointCloudScaling``) is shape-agnostic; a vote transform
    that reduces over axis 0 (e.g. ``PointCloudCenterAndNormalize``) is only
    meaningful per-scan — same caveat as in the reference."""
    probs = jax.nn.softmax(logits, axis=-1)
    for _ in range(num_votes):
        voted = transform({"pos": np.asarray(pos_host).copy()}, rng)
        probs = probs + jax.nn.softmax(run_on_pos(jnp.asarray(voted["pos"])),
                                       axis=-1)
    return jnp.log(probs / (num_votes + 1) + 1e-12)


@functools.partial(jax.jit, static_argnums=(7,))
def _upsample_cm(probs, pos, full_points, center, scale, labels, n_valid,
                 num_classes: int = 17):
    """Fused full-res upsample + per-scan confusion matrix, all on device.

    Fetching full-resolution predictions cost one D2H round-trip + ~100 KB
    per SAMPLE through the axon tunnel (~1 s/scan eval); the (C, C)
    confusion matrix carries everything ``seg_metrics_whole`` needs in 1 KB
    and lets the whole eval pipeline dispatch asynchronously.
    """
    pred = _upsample_pred(probs, pos, full_points, center, scale)
    valid = jnp.arange(pred.shape[0]) < n_valid
    flat = labels * num_classes + pred
    cm = jnp.zeros((num_classes * num_classes,), jnp.int32)
    cm = cm.at[flat].add(valid.astype(jnp.int32))
    return cm.reshape(num_classes, num_classes)


def _metrics_from_cm(cm: np.ndarray):
    """Same semantics as ``seg_metrics_whole`` (reference ``train.py:802-832``)
    from a (C, C) label-x-pred confusion matrix."""
    cm = np.asarray(cm, dtype=np.float64)
    row = cm.sum(1)
    col = cm.sum(0)
    diag = np.diag(cm)
    ious, dscs = [], []
    for c in range(1, cm.shape[0]):       # gum class 0 excluded
        if row[c] == 0:
            continue                       # class absent from ground truth
        union = row[c] + col[c] - diag[c]
        iou = diag[c] / union if union > 0 else 0.0
        ious.append(iou)
        dscs.append(2 * iou / (1 + iou))
    total = cm.sum()
    acc = float(diag.sum() / total) if total else float("nan")
    miou = float(np.mean(ious)) if ious else float("nan")
    mdsc = float(np.mean(dscs)) if dscs else float("nan")
    return acc, miou, mdsc


def validate(eval_step, variables, val_loader, cfg, logger=None,
             num_votes: int = 0, data_transform=None,
             bucket: int = 8192, mesh=None,
             tag: str = "val") -> Dict[str, float]:
    """Reference ``validate`` (``train.py:716-779``): whole-scan metrics split
    into mandible (cls 0) / maxillary (cls 1) / whole means.

    Two phases: everything (forward, voting, full-res upsample, per-scan
    confusion matrix, sampled-point accuracy) is DISPATCHED first — device
    work pipelines with host-side loading — then fetched in one sync.

    ``num_votes > 0``: average softmax over additional augmented passes using
    the ``vote`` transform pipeline (reference ``train.py:365-375``).

    ``mesh``: dp-shard the model batches over the mesh (GSPMD eval forward,
    matching the reference's DDP validation ``train.py:717``) and round-robin
    the per-scan upsample+confusion programs across the mesh's devices so
    they run concurrently; metrics are placement-invariant (asserted by
    ``test_dp_parity.py::test_dp_eval_matches_single_device``)."""
    mandible = {"miou": [], "dsc": [], "acc": []}
    maxillary = {"miou": [], "dsc": [], "acc": []}
    vote_rng = np.random.default_rng(int(cfg.get("seed", 0)) if cfg else 0)
    num_classes = int(cfg.get("num_classes", 17)) if cfg else 17
    pending_cm, pending_side, pending_acc = [], [], []

    # The val/test batches are identical every call (no set_epoch on eval
    # loaders, deterministic eval transforms), and host->device transfer of
    # the full-resolution scans dominates eval wall time on a slow link
    # (~0.5 MB/sample). Cache the device-resident eval tensors on the loader
    # after the first pass; later validations are device-bound.
    use_cache = bool(cfg.get("eval_device_cache", True)) if cfg else True
    # the cache is placement-specific: entries built for mesh=None are plain
    # default-device arrays, useless (and silently single-device) under a
    # mesh — key it on the placement and rebuild on mismatch
    cache_key = tuple(map(str, mesh.devices.flat)) if mesh is not None else None
    cache = None
    if use_cache:
        stored = getattr(val_loader, "_geot_eval_cache", None)
        if stored is not None and stored[0] == cache_key:
            cache = stored[1]
    if mesh is not None and jax.process_count() > 1:
        # multi-host: every host runs validate in lockstep on the UNSHARDED
        # val loader (identical global batches).  Batches are replicated on
        # the global mesh (dp-sharding them would leave per-scan logit rows
        # on non-addressable devices), and the per-scan upsample programs
        # round-robin over this host's addressable devices only.
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        put_model = lambda d: jax.tree_util.tree_map(        # noqa: E731
            lambda x: jax.device_put(x, rep), d)
        devs = [d for d in mesh.devices.flat
                if d.process_index == jax.process_index()]
    elif mesh is not None:
        from ..parallel import shard_batch
        put_model = lambda d: shard_batch(d, mesh)          # noqa: E731
        devs = list(mesh.devices.flat)
    else:
        put_model = lambda d: jax.tree_util.tree_map(jnp.asarray, d)  # noqa: E731
        devs = [None]
    n_sample = 0
    if cache is None:
        cache = []
        for batch in val_loader:
            entry = {
                "model_batch": put_model({"pos": batch["pos"],
                                          "x": batch["x"],
                                          "cls": batch["cls"]}),
                "pos_host": np.asarray(batch["pos"]),
                "y": put_model({"y": batch["y"]})["y"],
                "samples": [],
            }
            for i, full in enumerate(batch["points"]):
                full = np.asarray(full, dtype=np.float32)
                P = len(full)
                padded = pad_to_bucket(full, bucket)
                lab = np.zeros((len(padded),), dtype=np.int32)
                lab[:P] = np.asarray(batch["labels"][i], dtype=np.int32)
                dev = devs[n_sample % len(devs)]
                n_sample += 1
                placed = {
                    "pos": np.asarray(batch["pos"][i]),
                    "full": padded,
                    "labels": lab,
                    "center": np.asarray(batch["center"][i], np.float32),
                    "scale": np.float32(batch["scale"][i]),
                    "n_valid": np.int32(P),
                }
                if dev is not None:
                    placed = {k: jax.device_put(v, dev)
                              for k, v in placed.items()}
                else:
                    placed = {k: jnp.asarray(v) for k, v in placed.items()}
                placed["side"] = int(np.asarray(batch["cls"][i]).reshape(-1)[0])
                placed["device"] = dev
                entry["samples"].append(placed)
            cache.append(entry)
        if use_cache:
            val_loader._geot_eval_cache = (cache_key, cache)

    for entry in cache:
        model_batch = entry["model_batch"]
        logits = eval_step(variables, model_batch)
        if num_votes and data_transform is not None:
            def _run(vpos, mb=model_batch):
                vb = dict(mb)
                vb["pos"] = vpos
                vb["x"] = vpos
                return eval_step(variables, vb)

            logits = tta_vote_logits(logits, entry["pos_host"], num_votes,
                                     data_transform, vote_rng, _run)
        # direct accuracy on the sampled points — separates model quality
        # from the full-res upsampling path
        pending_acc.append(jnp.mean(
            (jnp.argmax(logits, -1) == entry["y"]).astype(jnp.float32)))
        probs = jax.nn.softmax(logits, axis=-1)
        assert probs.shape[-1] == num_classes, \
            f"cfg.num_classes={num_classes} != model classes {probs.shape[-1]}"
        for i, s in enumerate(entry["samples"]):
            probs_i = probs[i]
            if s.get("device") is not None:
                # colocate the forward output row with the sample's device so
                # the per-scan program runs there (round-robin concurrency)
                if jax.process_count() > 1:
                    # a multi-host (replicated) array is not "fully
                    # addressable", which device_put requires — hop through
                    # the host's local replica
                    probs_i = jax.device_get(probs_i)
                probs_i = jax.device_put(probs_i, s["device"])
            cm = _upsample_cm(probs_i, s["pos"], s["full"], s["center"],
                              s["scale"], s["labels"], s["n_valid"],
                              num_classes)
            pending_cm.append(cm)
            pending_side.append(s["side"])

    sampled_accs = [float(a) for a in jax.device_get(pending_acc)]
    for cm, side_id in zip(jax.device_get(pending_cm), pending_side):
        acc, miou, mdsc = _metrics_from_cm(cm)
        side = mandible if side_id == 0 else maxillary
        side["miou"].append(miou)
        side["dsc"].append(mdsc)
        side["acc"].append(acc)

    def _mean(vals):
        return float(np.mean(vals)) if vals else float("nan")

    out = {}
    for name, side in (("mandible", mandible), ("maxillary", maxillary)):
        for k in ("miou", "dsc", "acc"):
            out[f"{name}_{k}"] = _mean(side[k])
    n = len(mandible["miou"]) + len(maxillary["miou"])
    for k in ("miou", "dsc", "acc"):
        total = sum(mandible[k]) + sum(maxillary[k])
        out[f"whole_{k}"] = total / n if n else float("nan")
    out["sampled_acc"] = _mean(sampled_accs)
    if logger is not None:
        logger.info(f"{tag}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
    return out
