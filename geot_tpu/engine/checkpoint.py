"""Checkpointing.

Reference ``openpoints/utils/ckpt_util.py:69-258``: ``.pth`` files with
latest/best/milestone copies and prefix-reconciling loads.  Here the whole
train state is one pytree saved with orbax (``_ckpt_latest`` dir, ``_ckpt_best``
copy on improvement, ``_E{epoch}`` milestones), plus a torch ``.pth`` ->
flax-params converter for loading reference checkpoints (parity testing and
the ``pretrained_path`` workflow).
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import numpy as np


def _ckpt_path(ckpt_dir: str, run_name: str, tag: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"{run_name}_ckpt_{tag}")


def _restore(path: str):
    """Structure-free orbax restore, device-topology-agnostic.

    A checkpoint saved under a different device topology (e.g. a multi-host
    training run restored on a single serving host) makes the plain
    StandardCheckpointer restore refuse ("available devices are different
    from the devices used to save"); fall back to a PyTree restore with
    numpy leaves — placement is the caller's job anyway
    (``place_variables`` / ``load_checkpoint`` grafting)."""
    path = os.path.abspath(str(path))
    try:
        return _checkpointer().restore(path)
    except ValueError:
        import jax
        import orbax.checkpoint as ocp

        ptc = ocp.PyTreeCheckpointer()
        meta = ptc.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ptc.restore(path, restore_args=restore_args)


_CKPTR = None


def _checkpointer():
    """One StandardCheckpointer per process: each instance owns async-save
    background machinery, and constructing one per save/load call leaks
    threads over a 300-epoch run."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _is_primary() -> bool:
    """Host-side file ops (rmtree/rename/copytree) must run on ONE process —
    under multi-host training every process executes save_checkpoint, and
    concurrent tree deletes/copies on shared storage race.  (The orbax save
    itself is multi-host-coordinated and must be called by every process.)"""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def _swap_into_place(tmp: str, dst: str):
    """Atomically-enough replace ``dst`` with ``tmp``: the new tree is fully
    durable before the old one is touched, so a crash at any point leaves at
    least one complete checkpoint on disk (the old ``dst`` or ``tmp``)."""
    old = dst + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.exists(old):
        shutil.rmtree(old)


def save_checkpoint(cfg, state, epoch: int, additional_dict: Optional[Dict] = None,
                    is_best: bool = False, save_freq: Optional[int] = None):
    """Reference ``save_checkpoint`` (``ckpt_util.py:69-108``) semantics.

    Crash-safe: the new payload is written to a ``.tmp`` sibling and swapped
    in only once durable — the previous ``latest``/``best`` survive a kill
    mid-save (the preemption path depends on this)."""
    from flax.serialization import to_state_dict

    ckpt_dir = cfg["ckpt_dir"]
    run_name = cfg.get("run_name", "run")
    os.makedirs(ckpt_dir, exist_ok=True)
    latest = _ckpt_path(ckpt_dir, run_name, "latest")
    tmp = latest + ".tmp"
    # canonical nested-dict form so restore is independent of dataclass
    # flatten order
    payload = {"state": to_state_dict(state), "epoch": epoch,
               "extra": additional_dict or {}}
    ckptr = _checkpointer()
    # force=True: orbax deletes a stale .tmp itself (multi-host-coordinated,
    # unlike a manual rmtree here)
    ckptr.save(tmp, payload, force=True)
    ckptr.wait_until_finished()   # multi-host barrier inside
    if _is_primary():
        _swap_into_place(tmp, latest)
        if is_best:
            best = _ckpt_path(ckpt_dir, run_name, "best")
            shutil.copytree(latest, best + ".tmp")
            _swap_into_place(best + ".tmp", best)
        if save_freq and epoch % save_freq == 0:
            mile = _ckpt_path(ckpt_dir, run_name, f"E{epoch}")
            if not os.path.exists(mile):
                shutil.copytree(latest, mile)
    _sync_processes("geot_ckpt_commit")
    return latest


def _sync_processes(name: str):
    """Barrier after primary-only host file ops.  Without it, non-primary
    processes race ahead of the primary's latest/best swaps, so shared-fs
    existence checks (e.g. the best-ckpt reload before test eval,
    ``train.py`` test_freq block) disagree across hosts — and any
    path-conditional device_put/collective sequence then desyncs the
    processes (observed as a Gloo size-mismatch crash in the 2-process
    integration test)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def load_checkpoint(path: str, template_state,
                    missing_fields: Optional[list] = None):
    """Restore a state pytree saved by ``save_checkpoint``.

    Restores structure-free first (the ``extra`` metrics dict varies between
    runs), then grafts the state leaves onto the template's pytree structure.
    Params-only artifacts (e.g. the committed serving checkpoints) restore
    partially: absent top-level fields (optimizer state, queues, rng) keep
    the template's fresh values, so ``mode=resume`` fine-tunes from them.
    ``missing_fields``: optional out-list collecting those absent top-level
    field names (callers re-derive what they can — e.g. the semi driver
    re-bootstraps ``cm`` from the restored weights).
    """
    from flax.serialization import from_state_dict, to_state_dict

    import logging

    payload = _restore(path)
    saved = dict(payload["state"])
    full = to_state_dict(template_state)
    # optional fields (EMA eval shadow) may be an EMPTY dict on either side:
    # empty-in-checkpoint + enabled-in-run counts as missing (the caller
    # seeds it from the restored weights); enabled-in-checkpoint +
    # disabled-in-run is dropped (the run asked not to carry it)
    for opt_key in ("ema_params",):
        if opt_key in full and opt_key in saved:
            if full[opt_key] == {} and saved[opt_key]:
                saved[opt_key] = {}
            elif full[opt_key] != {} and saved[opt_key] == {}:
                del saved[opt_key]
    missing = [k for k in full if k not in saved]
    if missing_fields is not None:
        missing_fields.extend(missing)
    if missing:
        # model weights must be complete — a truncated/corrupted params tree
        # silently keeping random-init blocks is never acceptable
        def _gaps(dst, src, prefix):
            out = []
            for k, v in dst.items():
                if k not in src:
                    out.append(f"{prefix}{k}")
                elif isinstance(v, dict) and isinstance(src[k], dict):
                    out += _gaps(v, src[k], f"{prefix}{k}/")
            return out

        for weights_key in ("params", "batch_stats"):
            if weights_key in saved and weights_key in full:
                gaps = _gaps(full[weights_key], saved[weights_key],
                             f"{weights_key}/")
                if gaps:
                    raise ValueError(
                        f"checkpoint {path} is missing model-weight entries "
                        f"{gaps[:5]}{'...' if len(gaps) > 5 else ''} — refusing "
                        f"a partial weight restore")

        def _merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    _merge(dst[k], v)
                else:
                    dst[k] = v

        _merge(full, saved)
        # params-only artifact resumed into a semi state: seed the teacher
        # from the restored student (the resume point's student == teacher is
        # the sane default; a random-init teacher would silently poison the
        # teacher-phase pseudo-labels)
        seeded = []
        for tk, sk in (("teacher_params", "params"),
                       ("teacher_batch_stats", "batch_stats")):
            if tk in missing and tk in full and sk in saved:
                full[tk] = full[sk]
                seeded.append(tk)
        logging.getLogger("geot_tpu").warning(
            f"partial checkpoint {os.path.basename(str(path))}: fields "
            f"{missing} absent — kept fresh template values"
            + (f"; seeded {seeded} from the restored student" if seeded
               else ""))
        saved = full
    state = from_state_dict(template_state, saved)
    return state, payload.get("epoch", 0), payload.get("extra", {})


def graft_variables(variables, loaded, only_subtree: Optional[str] = None,
                    grafted_paths: Optional[list] = None,
                    report_missing: bool = True):
    """Merge ``loaded`` (a ``{"params": ..., "batch_stats"?: ...}`` dict from
    ``load_variables``/the torch converter) into freshly-initialised
    ``variables`` — the reference's finetune loads
    (``load_checkpoint(model, ...)`` / ``load_checkpoint(model_module.encoder,
    ...)``, ``examples/segmentation/train.py:198-203``).

    ``only_subtree``: restrict the graft to leaves whose module path contains
    the substring at ANY depth (e.g. ``"encoder"`` for
    ``mode=finetune_encoder`` — the flagship checkpoint nests it at
    ``segmentor/encoder``); non-matching leaves keep fresh init silently.
    Leaves with mismatched shapes are skipped with a report, matching the
    reference's missing/unexpected-key tolerance (``ckpt_util.py:225-258``).
    ``grafted_paths``: optional out-list collecting every grafted leaf path.
    Model leaves ABSENT from the checkpoint keep fresh init and are reported
    as ``(missing from checkpoint)`` — callers that publish metrics must
    treat those as fatal (eval on partially-random weights is garbage).
    Partial-by-design callers (e.g. the pretrain-encoder transfer, where the
    decoder/head keep fresh init on purpose) pass ``report_missing=False``.
    Returns ``(variables, skipped)``."""
    import copy

    skipped = []
    grafted = [] if grafted_paths is None else grafted_paths

    def _merge(dst, src, prefix):
        for k, v in src.items():
            path = f"{prefix}{k}"
            if isinstance(v, dict):
                if k not in dst:
                    if only_subtree is None or only_subtree in path:
                        skipped.append(f"{path} (unexpected)")
                elif isinstance(dst[k], dict):
                    _merge(dst[k], v, f"{path}/")
                else:
                    skipped.append(f"{path} (subtree vs leaf)")
                continue
            if only_subtree is not None and only_subtree not in path:
                continue  # filtered out by mode=finetune_encoder: not an error
            if k not in dst:
                skipped.append(f"{path} (unexpected)")
            elif getattr(dst[k], "shape", None) == getattr(v, "shape", None):
                dst[k] = v
                grafted.append(path)
            else:
                skipped.append(f"{path} (shape "
                               f"{getattr(v, 'shape', '?')} vs "
                               f"{getattr(dst[k], 'shape', '?')})")

    def _not_loaded(dst, prefix, touched):
        # dst-side leaves _merge never visits (it iterates src): absent from
        # the checkpoint entirely -> still random init after the graft
        for k, v in dst.items():
            path = f"{prefix}{k}"
            if isinstance(v, dict):
                _not_loaded(v, f"{path}/", touched)
            elif path not in touched and (only_subtree is None
                                          or only_subtree in path):
                skipped.append(f"{path} (missing from checkpoint)")

    out = copy.deepcopy(variables)
    for col in ("params", "batch_stats"):
        if col not in loaded or col not in out:
            continue
        before_g, before_s = len(grafted), len(skipped)
        _merge(out[col], loaded[col], f"{col}/")
        if report_missing:
            touched = set(grafted[before_g:])
            touched.update(s.split(" (", 1)[0] for s in skipped[before_s:])
            _not_loaded(out[col], f"{col}/", touched)
    if only_subtree is not None and not grafted:
        skipped.append(f"no module path matches '{only_subtree}' "
                       f"in the checkpoint")
    return out, skipped


def load_pretrain_encoder(variables, pretrain_path: str,
                          segmentor_key: str = "segmentor"):
    """Graft a generative-pretraining checkpoint's point-encoder trunk into a
    segmentation model's segmentor namespace — the reference's
    ``WholePartSeg.load_pretrain`` (``base_seg.py:97-123``: strip the
    pretraining model's top-level module prefix, prefix ``segmentor.``, load
    non-strict).  Here the ViewGenBase encoder submodule and the seg trunk
    share flax module names (encoder / reduce_dim / pos_embed / blocks), so
    the transfer is a name-matched subtree graft; unmatched entries (seg
    head, decoder pyramid, T-machinery) keep their fresh init and are
    reported.  Returns ``(variables, skipped)``."""
    loaded = load_variables(pretrain_path, prefer_ema=False)  # raw trunk
    # the flagship WholePartSeg nests the trunk under 'segmentor' (whose
    # children share the pretrain encoder's module names); zoo BaseSeg
    # models expose a top-level 'encoder' module instead — graft into
    # whichever exists rather than silently no-opping (round-3 review)
    target_key = (segmentor_key if segmentor_key in variables.get("params", {})
                  else "encoder" if "encoder" in variables.get("params", {})
                  else None)
    if target_key is None:
        raise ValueError(
            f"model has neither a '{segmentor_key}' nor an 'encoder' "
            f"top-level module to graft {pretrain_path} into "
            f"(params modules: {sorted(variables.get('params', {}))})")
    inner_fresh = {}
    inner_loaded = {}
    for col in ("params", "batch_stats"):
        if col in variables and target_key in variables[col] \
                and col in loaded and "encoder" in loaded[col]:
            inner_fresh[col] = variables[col][target_key]
            inner_loaded[col] = loaded[col]["encoder"]
    if "params" not in inner_loaded:
        raise ValueError(f"{pretrain_path}: checkpoint has no 'encoder' "
                         f"module to transfer (a geot_tpu.engine.pretrain "
                         f"checkpoint is expected)")
    grafted_paths: list = []
    # partial by design: the seg decoder/head/T-machinery keep fresh init —
    # only src-side anomalies (unexpected/shape) belong in `skipped`
    merged, skipped = graft_variables(inner_fresh, inner_loaded,
                                      grafted_paths=grafted_paths,
                                      report_missing=False)
    if not grafted_paths:
        raise ValueError(
            f"{pretrain_path}: no pretrain-encoder entry matched the model "
            f"(first skips: {skipped[:3]}) — wrong encoder family for this "
            f"segmentor?")
    out = dict(variables)
    for col in merged:
        out[col] = dict(out[col])
        out[col][target_key] = merged[col]
    return out, skipped


def discover_checkpoint(run_dir: str, prefer: str = "best") -> str:
    """Locate a checkpoint inside ``<run_dir>/checkpoint``: prefers
    ``*_ckpt_<prefer>``, then ``*_ckpt_latest``, then the NEWEST remaining
    directory by mtime (an alphabetical fallback would score a stale
    ``E100`` milestone over ``latest``).  Shared by the eval/evidence
    scripts."""
    ckdir = os.path.join(run_dir, "checkpoint")
    entries = [d for d in os.listdir(ckdir)
               if os.path.isdir(os.path.join(ckdir, d))
               and not d.endswith((".tmp", ".old"))]
    cands = ([d for d in entries if d.endswith(f"_ckpt_{prefer}")]
             or [d for d in entries if d.endswith("_ckpt_latest")]
             or sorted(entries, key=lambda d: os.path.getmtime(
                 os.path.join(ckdir, d)), reverse=True))
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {ckdir}")
    return os.path.join(ckdir, cands[0])


def load_variables(path: str, prefer_ema="auto"):
    """Model variables (params + batch_stats) from a saved checkpoint, no
    state template needed — for export/serving where the optimizer state is
    irrelevant.

    ``prefer_ema``: ``True`` returns the Polyak-averaged evaluation weights
    (``state.ema_params``, maintained under ``cfg.ema_eval``) as ``params``
    when the checkpoint carries them, ``False`` the raw weights, ``"auto"``
    (default) whichever tree the run's own best-val selection recorded as
    the winner (``extra["ema_selected"]`` — 1.0/0.0, written by
    ``engine/train.py``; EMA when the record is absent but the shadow
    exists)."""
    payload = _restore(path)
    st = payload["state"]
    if prefer_ema == "auto":
        rec = (payload.get("extra") or {}).get("ema_selected")
        prefer_ema = True if rec is None else bool(rec)
    params = st["params"]
    if prefer_ema and st.get("ema_params"):
        params = st["ema_params"]
    out = {"params": params}
    if st.get("batch_stats"):
        out["batch_stats"] = st["batch_stats"]
    return out


# --------------------------------------------------------------------------
# torch .pth -> flax conversion (flagship PointTransformer_seg_T family)
# --------------------------------------------------------------------------

def _strip_prefixes(key: str) -> str:
    """Normalise reference key prefixes (``module.``, ``model.``,
    ``segmentor.``) the way ``load_checkpoint``/``load_pretrain`` reconcile
    them (reference ``ckpt_util.py:225-258``, ``base_seg.py:97-123``)."""
    for p in ("module.", "model."):
        if key.startswith(p):
            key = key[len(p):]
    return key


def convert_torch_seg_t(state_dict: Dict[str, np.ndarray], depth: int = 12):
    """Map a reference ``PointTransformer_seg_T`` torch state_dict to this
    rebuild's param/batch_stats trees (channels-last Dense layout).

    torch Conv1d/Conv2d k=1 weights (out, in, 1[, 1]) and Linear weights
    (out, in) all become Dense kernels (in, out).
    """
    sd = {_strip_prefixes(k): np.asarray(v) for k, v in state_dict.items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def dense(tkey, has_bias=True):
        w = sd[tkey + ".weight"]
        w = w.reshape(w.shape[0], -1).T          # (in, out)
        out = {"kernel": w}
        if has_bias and tkey + ".bias" in sd:
            out["bias"] = sd[tkey + ".bias"]
        return out

    def bn(tkey):
        p = {"scale": sd[tkey + ".weight"], "bias": sd[tkey + ".bias"]}
        s = {"mean": sd[tkey + ".running_mean"], "var": sd[tkey + ".running_var"]}
        return p, s

    def ln(tkey):
        return {"scale": sd[tkey + ".weight"], "bias": sd[tkey + ".bias"]}

    def gn(tkey):
        return {"scale": sd[tkey + ".weight"], "bias": sd[tkey + ".bias"]}

    pfx = "segmentor."

    # mini-PointNet encoder
    enc_p, enc_s = {}, {}
    enc_p["conv1a"] = dense(pfx + "encoder.first_conv.0")
    enc_p["bn1"], enc_s["bn1"] = bn(pfx + "encoder.first_conv.1")
    enc_p["conv1b"] = dense(pfx + "encoder.first_conv.3")
    enc_p["conv2a"] = dense(pfx + "encoder.second_conv.0")
    enc_p["bn2"], enc_s["bn2"] = bn(pfx + "encoder.second_conv.1")
    enc_p["conv2b"] = dense(pfx + "encoder.second_conv.3")
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    if pfx + "reduce_dim.weight" in sd:
        params["reduce_dim"] = dense(pfx + "reduce_dim")

    params["pos_embed"] = {"fc1": dense(pfx + "pos_embed.0"),
                           "fc2": dense(pfx + "pos_embed.2")}

    blocks = {}
    for i in range(depth):
        b = f"{pfx}blocks.blocks.{i}."
        blocks[f"block_{i}"] = {
            "norm1": ln(b + "norm1"),
            "attn": {"qkv": dense(b + "attn.qkv"),
                     "proj": dense(b + "attn.proj")},
            "norm2": ln(b + "norm2"),
            "mlp": {"fc1": dense(b + "mlp.fc1"), "fc2": dense(b + "mlp.fc2")},
        }
    params["blocks"] = blocks
    params["norm"] = ln(pfx + "norm")

    # FP modules: erikwijmans SharedMLP -> mlp.layer{j}.conv/.bn.bn
    def fp(tname, fname):
        p, s = {}, {}
        for j in range(2):
            conv_key = f"{pfx}{tname}.mlp.layer{j}.conv"
            bn_key = f"{pfx}{tname}.mlp.layer{j}.bn.bn"
            p[f"dense_{j}"] = dense(conv_key, has_bias=False)
            p[f"bn_{j}"], s[f"bn_{j}"] = bn(bn_key)
        params[fname] = {"mlp": p}
        stats[fname] = {"mlp": s}

    fp("propogation_2", "propagation_2")
    fp("propogation_1", "propagation_1")
    fp("propogation_0", "propagation_0")

    for tname, fname in (("dgcnn_pro_1", "dgcnn_pro_1"),
                         ("dgcnn_pro_2", "dgcnn_pro_2")):
        params[fname] = {
            "layer1_conv": dense(pfx + tname + ".layer1.0", has_bias=False),
            "layer1_gn": gn(pfx + tname + ".layer1.1"),
            "layer2_conv": dense(pfx + tname + ".layer2.0", has_bias=False),
            "layer2_gn": gn(pfx + tname + ".layer2.1"),
        }

    seg_p = {"conv1": dense(pfx + "seg_head.0"),
             "conv2": dense(pfx + "seg_head.3")}
    seg_bn_p, seg_bn_s = bn(pfx + "seg_head.1")
    seg_p["bn"] = seg_bn_p
    params["seg_head"] = seg_p
    stats["seg_head"] = {"bn": seg_bn_s}

    if pfx + "T_linear.weight" in sd:
        params["T_linear"] = sd[pfx + "T_linear.weight"]
        params["T_revision"] = sd[pfx + "T_revision.weight"]
        params["sigma"] = sd[pfx + "sigma"]

    # wrap under the WholePartSeg module name
    return ({"segmentor": params}, {"segmentor": stats})


def load_torch_pth(path: str, with_epoch: bool = False):
    """Read a reference ``.pth`` checkpoint's model state_dict as numpy.

    ``with_epoch=True`` also returns the checkpoint's epoch counter (0 when
    the file is a bare state_dict) so converters can forward it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd_np = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in sd.items()}
    if with_epoch:
        epoch = int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0
        return sd_np, epoch
    return sd_np


def convert_cli(argv=None):
    """``geot-convert <in.pth> <out_dir> [--depth 12]`` — one-shot migration
    of a reference ``PointTransformer_seg_T`` torch checkpoint
    (``{run}_ckpt_best.pth`` etc.) into a params-only orbax artifact loadable
    by ``load_variables``, the predict/serve CLIs, ``engine.export``, and
    ``mode=resume`` params-only grafting.  Runs on the CPU backend — no
    accelerator needed on the migration host."""
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a reference GeoT .pth checkpoint to a "
                    "params-only orbax artifact")
    p.add_argument("pth", help="reference .pth checkpoint")
    p.add_argument("out", help="output artifact directory (created)")
    p.add_argument("--depth", type=int, default=12,
                   help="transformer depth of the checkpoint (default 12)")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    sd, epoch = load_torch_pth(args.pth, with_epoch=True)
    params, stats = convert_torch_seg_t(sd, depth=args.depth)
    v = {"params": params}
    if stats:
        v["batch_stats"] = stats
    out = os.path.abspath(args.out)
    saver = ocp.StandardCheckpointer()
    # full save_checkpoint payload shape (epoch forwarded from the .pth) so
    # the artifact also feeds load_checkpoint / mode=resume, not just
    # load_variables
    saver.save(out, {"state": v, "epoch": epoch, "extra": {}})
    saver.wait_until_finished()
    saver.close()
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"converted {args.pth} -> {out} ({n / 1e6:.3f} M params"
          f"{', batch_stats' if stats else ''})")
    return out


# --------------------------------------------------------------------------
# reference ckpt_util public-surface parity (``openpoints/utils/ckpt_util.py``)
# --------------------------------------------------------------------------


def resume_model(state, cfg=None, pretrained_path: Optional[str] = None):
    """Restore ONLY the model weights (params + batch_stats) from a checkpoint
    into ``state`` (reference ``resume_model``, ``ckpt_util.py:25-52``: loads
    the model state_dict and returns the bookmarked epoch/metrics).

    Returns ``(state, epoch, extra)``; a missing path logs and returns the
    state unchanged with epoch 0, like the reference."""
    import logging

    if pretrained_path is None and cfg is not None:
        pretrained_path = _ckpt_path(cfg["ckpt_dir"],
                                     cfg.get("run_name", "run"), "latest")
    if not (pretrained_path and os.path.exists(str(pretrained_path))):
        logging.info(f"[RESUME INFO] no checkpoint file from path "
                     f"{pretrained_path}...")
        return state, 0, {}
    # raw weights: this is the reference resume_model semantics (training
    # continues from the raw trajectory, never from an EMA snapshot)
    loaded = load_variables(pretrained_path, prefer_ema=False)
    new = state.replace(params=loaded["params"],
                        **({"batch_stats": loaded["batch_stats"]}
                           if "batch_stats" in loaded
                           and hasattr(state, "batch_stats") else {}))
    payload = _restore(pretrained_path)
    return new, payload.get("epoch", 0), payload.get("extra", {})


def resume_optimizer(state, cfg=None, pretrained_path: Optional[str] = None):
    """Restore ONLY the optimizer state from a checkpoint into ``state``
    (reference ``resume_optimizer``, ``ckpt_util.py:55-75``)."""
    import logging

    from flax.serialization import from_state_dict, to_state_dict

    if pretrained_path is None and cfg is not None:
        pretrained_path = _ckpt_path(cfg["ckpt_dir"],
                                     cfg.get("run_name", "run"), "latest")
    if not (pretrained_path and os.path.exists(str(pretrained_path))):
        logging.info(f"[RESUME INFO] no checkpoint file from path "
                     f"{pretrained_path}...")
        return state, 0, {}
    payload = _restore(pretrained_path)
    saved = payload["state"]
    if "opt_state" not in saved:
        logging.warning(f"checkpoint {pretrained_path} carries no optimizer "
                        f"state (params-only artifact) — state unchanged")
        return state, payload.get("epoch", 0), payload.get("extra", {})
    sd = to_state_dict(state)
    sd["opt_state"] = saved["opt_state"]
    return (from_state_dict(state, sd), payload.get("epoch", 0),
            payload.get("extra", {}))


def _group_checkpoint_keys(keys):
    """Group dotted keys by their prefix up to the final '.'
    (reference ``ckpt_util.py:293-310``)."""
    from collections import defaultdict

    groups = defaultdict(list)
    for key in keys:
        pos = key.rfind(".")
        if pos >= 0:
            head, tail = key[:pos], [key[pos + 1:]]
        else:
            head, tail = key, []
        groups[head].extend(tail)
    return groups


def _group_to_str(group) -> str:
    """Reference ``ckpt_util.py:313-327``."""
    if len(group) == 0:
        return ""
    if len(group) == 1:
        return "." + group[0]
    return ".{" + ", ".join(group) + "}"


def get_missing_parameters_message(keys) -> str:
    """Loggable report of model keys absent from a checkpoint
    (reference ``ckpt_util.py:225-238``; the termcolor wrapping is dropped —
    the rebuild's logger colorises levels itself)."""
    groups = _group_checkpoint_keys(keys)
    return ("Some model parameters or buffers are not found in the "
            "checkpoint:\n" + "\n".join(
                "  " + k + _group_to_str(v) for k, v in groups.items()))


def get_unexpected_parameters_message(keys) -> str:
    """Loggable report of checkpoint keys the model does not use
    (reference ``ckpt_util.py:240-255``)."""
    groups = _group_checkpoint_keys(keys)
    return ("The checkpoint state_dict contains keys that are not used by "
            "the model:\n" + "\n".join(
                "  " + k + _group_to_str(v) for k, v in groups.items()))


# reference name for the full-state resume (``ckpt_util.py:111``); the JAX
# signature is (path, template_state) -> (state, epoch, extra)
resume_checkpoint = load_checkpoint
