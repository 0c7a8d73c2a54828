"""Standalone inference CLI — the serving-facing path.

The reference has no inference entry point (eval only happens inside the
training loop); production deployment needs one:

    python -m geot_tpu.engine.predict --cfg cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml \
        --ckpt <orbax dir | reference .pth> --input scan.obj --output labels.json [--ply out.ply]

Pipeline: OBJ vertices (C++ fast parser) -> unit-sphere normalise -> 16k
subsample -> jitted flagship forward -> three_nn upsample of softmax to the
full scan -> FDI labels json (+ optional coloured PLY).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..core.config import EasyConfig
from ..data.io import load_obj_vertices
from ..data.tooth_semi import FDI_LABEL_MAP, pc_norm
from ..models import build_model_from_cfg
from .eval import get_pred_whole

# contiguous class id -> FDI code of the upper/lower jaw
_ID2FDI_LOWER = {0: 0, **{v: k for k, v in FDI_LABEL_MAP.items() if 30 < k < 50}}
_ID2FDI_UPPER = {0: 0, **{v: k for k, v in FDI_LABEL_MAP.items() if 10 < k < 30}}
# vectorised lookup tables for the hot serving path: a python per-point
# dict loop costs ~10 ms per 16k-point scan on a small host (measured by
# the serve load test), np.take is ~100x cheaper
_FDI_LUT_LOWER = np.array([_ID2FDI_LOWER[i]
                           for i in range(max(_ID2FDI_LOWER) + 1)], np.int32)
_FDI_LUT_UPPER = np.array([_ID2FDI_UPPER[i]
                           for i in range(max(_ID2FDI_UPPER) + 1)], np.int32)


def map_pred_to_fdi(pred, jaw: int):
    """Contiguous class-id predictions -> python list of FDI codes."""
    lut = _FDI_LUT_LOWER if jaw == 0 else _FDI_LUT_UPPER
    return np.take(lut, np.asarray(pred, dtype=np.int64)).tolist()


def load_model_and_params(cfg, ckpt_path=None):
    """Build the model and load weights.  ``ckpt_path``: a single checkpoint
    (orbax dir or reference ``.pth``), or an ENSEMBLE — a list/tuple or a
    comma-separated string of checkpoints — in which case ``variables`` is a
    tuple of member weight trees and every predict path averages the member
    softmax (mean-probability ensemble; +0.09 whole mIoU over the best member
    on the committed serving trio, ``log/ensemble_eval.json``)."""
    import jax
    import jax.numpy as jnp

    if isinstance(ckpt_path, str) and "," in ckpt_path:
        ckpt_path = [p for p in ckpt_path.split(",") if p]
    if isinstance(ckpt_path, (list, tuple)) and len(ckpt_path) == 1:
        ckpt_path = ckpt_path[0]
    if isinstance(ckpt_path, (list, tuple)):
        model = None
        members = []
        for p in ckpt_path:
            model, v = load_model_and_params(cfg, p)
            members.append(v)
        return model, tuple(members)

    model = build_model_from_cfg(cfg.model)
    if ckpt_path and ckpt_path.endswith(".pth"):
        # converter output is pure numpy: device_put it once, or every jitted
        # forward re-uploads the whole weight tree H2D per call (seconds per
        # request through the axon tunnel)
        from .checkpoint import convert_torch_seg_t, load_torch_pth

        sd = load_torch_pth(ckpt_path)
        p, s = convert_torch_seg_t(sd, depth=cfg.model.segmentor_args.depth)
        return model, jax.device_put({"params": p, "batch_stats": s})

    # fresh init is the template (and the no-checkpoint fallback); skipped
    # for .pth above — the converter rebuilds both trees from scratch
    n = int(cfg.get("num_points", 16000))
    pos0 = jnp.zeros((1, n, 3))
    init_batch = {"pos": pos0, "x": pos0, "cls": jnp.zeros((1, 1), jnp.int32)}
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, init_batch)
    if ckpt_path:
        from flax.serialization import from_state_dict

        from .checkpoint import load_variables

        # use_ema=auto serves whichever tree the run's own best-val selection
        # recorded as the winner (extra["tree"]); true/false force it
        use_ema = cfg.get("use_ema", "auto")
        loaded = load_variables(             # handles optional batch_stats
            ckpt_path, prefer_ema=("auto" if use_ema == "auto"
                                   else bool(use_ema)))
        missing = set(variables) - {"params"} - set(loaded)
        if missing & {"batch_stats"}:
            raise ValueError(f"{ckpt_path} has no batch_stats but the model "
                             f"needs them — wrong checkpoint for this model?")
        # from_state_dict validates leaf coverage against the init template
        # (loud failure on tree drift instead of random-weight inference);
        # collections absent from the checkpoint keep their template values
        variables = {col: (from_state_dict(variables[col], loaded[col])
                           if col in loaded else variables[col])
                     for col in variables}
        variables = jax.device_put(variables)
    return model, variables


# jitted forwards keyed per model instance: a fresh jit(lambda ...) per call
# would retrace every request (jit caches by function identity) — fatal for
# the serving endpoint, which calls predict_scan once per HTTP request.
# Bounded LRU so model-constructing sweeps don't pin executables forever.
_FWD_CACHE: "dict[int, tuple]" = {}
_FWD_CACHE_MAX = 4


def _get_fwd(model):
    import jax

    entry = _FWD_CACHE.pop(id(model), None)
    if entry is None or entry[0] is not model:
        entry = (model, jax.jit(lambda v, b: model.apply(v, b)))
    _FWD_CACHE[id(model)] = entry          # (re)insert as most-recent
    while len(_FWD_CACHE) > _FWD_CACHE_MAX:
        _FWD_CACHE.pop(next(iter(_FWD_CACHE)))
    return entry[1]


def predict_scan(model, variables, points: np.ndarray, jaw: int = 0,
                 num_points: int = 16000, seed: int = 0,
                 num_votes: int = 0, vote_transform=None, device=None):
    """points (P, 3) raw scan -> (full-res predictions (P,) np.uint8,
    sampled logits (N, C) DEVICE array — ``np.asarray`` it if needed).

    ``device``: commit the input batch to this device (``variables`` must
    already live there) so the whole scan executes on it — the per-replica
    dispatch used by multi-device serving (``engine.serve``).

    ``num_votes > 0`` with a ``vote_transform``: average softmax over
    additional augmented passes — the reference's TTA voting protocol
    (``train.py:365-375``) exposed at inference (measured +0.11 whole mIoU
    at 10 votes on the committed serving ckpt, ``log/voting_eval.json``).

    ``variables`` may be a tuple of member weight trees (see
    ``load_model_and_params`` ensemble mode): member softmax is averaged,
    and any voting passes average over the ensemble too."""
    import jax
    import jax.numpy as jnp

    points_norm, center, scale = pc_norm(points.astype(np.float32))
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(points_norm), num_points,
                     replace=len(points_norm) < num_points)
    pos = points_norm[sel][None]

    def _put(x):
        return jax.device_put(x, device) if device is not None else \
            jnp.asarray(x)

    batch = {"pos": _put(pos), "x": _put(pos),
             "cls": _put(np.full((1, 1), jaw, np.int32))}
    members = (variables if isinstance(variables, (list, tuple))
               else (variables,))

    def _logits(vb):
        if len(members) == 1:
            out = _get_fwd(model)(members[0], vb)
            return out[0] if isinstance(out, tuple) else out
        # mean-probability ensemble, returned as log-probs so downstream
        # softmax/argmax see exactly the averaged distribution (same trick
        # as ``tta_vote_logits``)
        probs = None
        for v in members:
            out = _get_fwd(model)(v, vb)
            lg = out[0] if isinstance(out, tuple) else out
            p = jax.nn.softmax(lg, axis=-1)
            probs = p if probs is None else probs + p
        return jnp.log(probs / len(members) + 1e-12)

    logits = _logits(batch)
    if num_votes:
        if vote_transform is None:
            raise ValueError("num_votes > 0 requires a vote transform "
                             "pipeline (cfg datatransforms.vote)")
        from .eval import tta_vote_logits

        def _run(vpos):
            return _logits({"pos": vpos[None], "x": vpos[None],
                            "cls": batch["cls"]})

        logits = tta_vote_logits(logits, pos[0], num_votes, vote_transform,
                                 rng, _run)
    # uint8 labels: 4x less D2H than int32 argmax (17 classes fit a byte)
    preds = get_pred_whole(logits, pos, [points], [center], [scale],
                           dtype=np.uint8)
    # logits stay a DEVICE array: fetching the (N, C) f32 block costs ~1 s
    # through the tunnel and every current caller discards it
    return preds[0], logits[0]


def predict_stream(model, variables, items, num_points: int = 16000,
                   seed: int = 0, inflight: int = 8, bucket: int = 8192,
                   devices=None):
    """Pipelined multi-scan inference (the batch-serving path).

    ``items``: iterable of ``(name, points (P,3) float np, jaw int)``.
    Yields ``(name, points, preds (P,) np.uint8, jaw)`` in input order.

    Everything device-side dispatches asynchronously: the forward and the
    full-resolution three_nn+argmax upsample for scan *i+1..i+inflight* are
    already queued while scan *i*'s predictions are still in flight, so host
    parse/normalise work and D2H fetches overlap device compute (each device
    executes FIFO).  Full scans are padded to ``bucket`` multiples so the
    upsample jit compiles once per bucket, exactly like ``engine.eval``.

    ``devices``: round-robin scans across these devices with per-device
    parameter replicas (serving scale-out: per-cloud serial chains pipeline
    best solo, so one scan per device beats batching — the B=1 result from
    ``bench.py``).  Default: single default device.  Results are
    device-placement-invariant (tested on the 8-device CPU mesh).
    """
    import collections

    import jax
    import jax.numpy as jnp

    from .eval import _upsample_pred
    from .eval import pad_to_bucket as _pad

    # ensemble-aware forward: ``variables`` may be a tuple of member weight
    # trees (see ``load_model_and_params``) — softmax averaged in ONE jitted
    # program, so the streaming dispatch pattern is unchanged
    members = (tuple(variables) if isinstance(variables, (list, tuple))
               else (variables,))
    variables = members

    def _mean_probs(vs, b):
        probs = None
        for v in vs:
            p = jax.nn.softmax(model.apply(v, b)[0][0], axis=-1)
            probs = p if probs is None else probs + p
        return probs / len(vs)

    fwd = jax.jit(_mean_probs)
    # class ids fit in a byte (17 classes): fetching uint8 labels is 4x less
    # D2H than the argmax's int32 — the fetch is the streaming bottleneck on
    # thin links
    upsample_u8 = jax.jit(lambda *a: _upsample_pred(*a).astype(jnp.uint8))
    rng = np.random.default_rng(seed)
    pending = collections.deque()

    if devices:
        replicas = [jax.device_put(variables, d) for d in devices]
        inflight = max(inflight, 2 * len(devices))  # keep every queue fed
    else:
        # device_put (idempotent for device arrays) so numpy weight trees
        # don't re-upload H2D on every scan
        devices, replicas = [None], [jax.device_put(variables)]

    def _put(x, d):
        return jax.device_put(x, d) if d is not None else jnp.asarray(x)

    def _drain(n):
        while len(pending) > n:
            name, pts, jaw, dev = pending.popleft()
            yield name, pts, np.asarray(dev)[:len(pts)], jaw

    for i, (name, points, jaw) in enumerate(items):
        d = devices[i % len(devices)]
        v = replicas[i % len(devices)]
        points = np.asarray(points, dtype=np.float32)
        points_norm, center, scale = pc_norm(points)
        sel = rng.choice(len(points_norm), num_points,
                         replace=len(points_norm) < num_points)
        pos = _put(points_norm[sel][None], d)
        probs = fwd(v, {"pos": pos, "x": pos,
                        "cls": _put(np.full((1, 1), jaw, np.int32), d)})
        padded = _pad(points, bucket)
        dev = upsample_u8(probs, pos[0], _put(padded, d),
                          _put(center, d), _put(np.float32(scale), d))
        pending.append((name, points, jaw, dev))
        yield from _drain(inflight)
    yield from _drain(0)


def _iter_scan_files(root, jaw=None):
    exts = (".obj", ".npy")
    names = sorted(n for n in os.listdir(root)
                   if os.path.splitext(n)[1].lower() in exts)
    for n in names:
        path = os.path.join(root, n)
        pts = (np.load(path) if n.lower().endswith(".npy")
               else load_obj_vertices(path))
        yield n, pts, (jaw if jaw is not None
                       else 0 if "lower" in n.lower() else 1)


def main(argv=None):
    parser = argparse.ArgumentParser("GeoT-TPU inference")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint dir or reference .pth; "
                             "comma-separate several for a mean-softmax "
                             "ensemble (log/ensemble_eval.json)")
    parser.add_argument("--input", required=True,
                        help=".obj scan, .npy Nx3, or a DIRECTORY of scans "
                             "(streamed with a pipelined dispatch window)")
    parser.add_argument("--output", default="labels.json")
    parser.add_argument("--ply", default=None, help="optional coloured PLY out")
    parser.add_argument("--votes", type=int, default=0,
                        help="TTA voting passes (cfg's vote transform "
                             "pipeline; +0.11 mIoU at 10 on the committed "
                             "serving ckpt); single-scan mode only")
    parser.add_argument("--jaw", type=int, default=None,
                        help="0 lower / 1 upper; inferred from filename if absent")
    parser.add_argument("--fast", action="store_true",
                        help="serving fast path: stratified FPS pyramid "
                             "(prefix 1024) + DGCNN cross-index reuse — "
                             "~1.7x throughput; pair with a serving-finetuned "
                             "checkpoint for quality parity "
                             "(log/fast_pyramid_eval.json)")
    args, opts = parser.parse_known_args(argv)

    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update(opts)
    if args.fast:
        cfg.model.segmentor_args.fast_pyramid = 1024
        cfg.model.segmentor_args.fast_graph = True

    if os.path.isdir(args.input):
        # batch-serving mode: stream every scan in the directory through a
        # pipelined dispatch window; --output is a directory of per-scan json
        if args.votes:
            parser.error("--votes is single-scan only (the streaming path "
                         "dispatches one pass per scan)")
        model, variables = load_model_and_params(cfg, args.ckpt)
        os.makedirs(args.output, exist_ok=True)
        num_points = int(cfg.get("num_points", 16000))
        t0, n_done = time.time(), 0
        import jax

        devs = jax.local_devices()
        items = _iter_scan_files(args.input, jaw=args.jaw)
        for name, points, pred, jaw in predict_stream(
                model, variables, items, num_points=num_points,
                devices=devs if len(devs) > 1 else None):
            labels = map_pred_to_fdi(pred, jaw)
            stem = os.path.splitext(name)[0]
            with open(os.path.join(args.output, stem + ".json"), "w") as f:
                json.dump({"labels": labels,
                           "jaw": "lower" if jaw == 0 else "upper",
                           "n_points": len(labels)}, f)
            if args.ply:  # directory mode: --ply enables per-scan PLYs
                from ..utils import save_ply

                save_ply(os.path.join(args.output, stem + ".ply"),
                         points, labels=pred)
            n_done += 1
        dt = time.time() - t0
        print(f"wrote {n_done} scans to {args.output} in {dt:.2f}s "
              f"({n_done / max(dt, 1e-9):.1f} scans/s end-to-end)")
        return n_done

    jaw = args.jaw
    if jaw is None:
        # filename only — a 'lower' in a parent DIRECTORY name must not
        # flip the jaw (matches _iter_scan_files)
        jaw = 0 if "lower" in os.path.basename(args.input).lower() else 1

    points = (np.load(args.input)
              if args.input.lower().endswith(".npy")
              else load_obj_vertices(args.input))
    model, variables = load_model_and_params(cfg, args.ckpt)
    t0 = time.time()
    vote_t = None
    if args.votes:
        from ..data.transforms import build_transforms_from_cfg

        vote_t = build_transforms_from_cfg("vote", cfg.get("datatransforms"))
        if vote_t is None:
            parser.error("--votes needs a vote transform pipeline in the "
                         "config (datatransforms.vote) — the flagship yaml "
                         "defines one; this config does not")
    pred, _ = predict_scan(model, variables, points, jaw=jaw,
                           num_points=int(cfg.get("num_points", 16000)),
                           num_votes=args.votes, vote_transform=vote_t)
    dt = time.time() - t0
    labels = map_pred_to_fdi(pred, jaw)
    with open(args.output, "w") as f:
        json.dump({"labels": labels, "jaw": "lower" if jaw == 0 else "upper",
                   "n_points": len(labels), "seconds": dt}, f)
    print(f"wrote {args.output}: {len(labels)} labels in {dt:.2f}s")
    if args.ply:
        from ..utils import save_ply

        save_ply(args.ply, points, labels=pred)
        print(f"wrote {args.ply}")
    return labels


if __name__ == "__main__":
    main()
