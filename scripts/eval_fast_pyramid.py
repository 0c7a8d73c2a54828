"""Quality evaluation of the stratified-pyramid serving modes on the
committed 300-epoch best checkpoint (VERDICT r2 #3: quality evidence for the
serving default).  Runs validate() with fast_pyramid in {False, 512-only,
int L} and writes log/fast_pyramid_eval.json.

TPU, serial: ``python scripts/eval_fast_pyramid.py [run_dir]``
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT_RUN = ("log/tooth_semi/tooth_semi-train-transformer_finetune_"
               "fixmatch_ntm-seed42-20260817-004730-b82ef419")


def main():
    import jax

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.engine.checkpoint import load_variables
    from geot_tpu.engine.eval import validate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.models import build_model_from_cfg

    run = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_RUN
    cfg = EasyConfig()
    cfg.load(os.path.join(run, "cfg.yaml"))
    from geot_tpu.engine.checkpoint import discover_checkpoint
    best = discover_checkpoint(run)
    variables = load_variables(best)

    val_loader = build_dataloader_from_cfg(
        cfg.get("batch_size_val", 2), cfg.dataset_l, cfg.get("dataloader"),
        cfg.get("datatransforms"), split="val", seed=cfg.get("seed", 0))

    default_modes = (False, True, 1024, 2048)
    if len(sys.argv) > 2:        # e.g. "exact,1024,1024+fg"
        def _parse(tok):
            fg = tok.endswith("+fg")
            tok = tok[:-3] if fg else tok
            m = (False if tok == "exact"
                 else True if tok in ("512", "tok") else int(tok))
            return (m, fg)
        modes = [_parse(t) for t in sys.argv[2].split(",")]
    else:
        modes = [(m, False) for m in default_modes]

    results = {"checkpoint": best, "modes": {}}
    for mode, fg in modes:
        seg = dict(cfg.model.segmentor_args)
        seg.pop("pretrained_path", None)
        seg.pop("fast_pyramid", None)   # run cfg may bake a serving mode in
        seg.pop("fast_graph", None)
        if mode:
            seg["fast_pyramid"] = mode
        if fg:
            seg["fast_graph"] = True
        model = build_model_from_cfg({"NAME": "WholePartSeg",
                                      "segmentor_args": seg})
        step = make_eval_step(model)
        res = validate(step, variables, val_loader, cfg)
        key = "exact" if mode is False else (
            "fps512_only" if mode is True else f"fps{mode}")
        if fg:
            key += "+fast_graph"
        results["modes"][key] = {k: round(float(v), 4)
                                 for k, v in res.items()}
        print(key, results["modes"][key])
        # each mode retraces; drop the loader cache? no — cache is
        # device-resident inputs only, shared across modes safely

    out = os.environ.get("FP_EVAL_OUT")
    if out:                      # opt-in: don't clobber committed evidence
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results["modes"]))


if __name__ == "__main__":
    main()
