"""Multi-checkpoint ensemble evaluation: mean-softmax over K committed
serving-topology checkpoints (the inference-time analogue of the reference's
TTA voting, ``examples/segmentation/train.py:365-375`` — there the averaged
passes come from augmented inputs, here from independently trained weights).

Members default to the three committed serving-topology artifacts (all
fast_pyramid=1024 + fast_graph):

  A  all-fast from-scratch seed 7   (val whole mIoU 0.7929)
  B  all-fast from-scratch seed 42  (0.7908)
  C  serving fine-tune of the exact-trained seed-42 base (0.7924)

TPU, serial:

    python scripts/eval_ensemble.py [--votes N] [ckpt_dir ...]

Writes ``log/ensemble_eval.json`` (member metrics + ensemble prefixes) so the
result is re-verifiable from the repo alone.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
DEFAULT_CKPTS = {
    "fast_seed7": ("log/tooth_semi/tooth_semi-train-transformer_finetune_"
                   "fixmatch_ntm-seed7-20260819-095755-948ed0c7/"
                   "checkpoint_params_only/fast_trained_seed7_best_params_only"),
    "fast_seed42": ("log/tooth_semi/tooth_semi-train-transformer_finetune_"
                    "fixmatch_ntm-seed42-20260818-144617-2e995103/"
                    "checkpoint_params_only/fast_trained_best_params_only"),
    "serving_ft": ("log/tooth_semi/serving_ft_fastgraph-seed42-ep315/"
                   "checkpoint/serving_ft_fastgraph_params_only"),
}
CFG_RUN = ("log/tooth_semi/tooth_semi-train-transformer_finetune_"
           "fixmatch_ntm-seed7-20260819-095755-948ed0c7")


def main():
    import jax
    import jax.numpy as jnp

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.data.transforms import build_transforms_from_cfg
    from geot_tpu.engine.checkpoint import load_variables
    from geot_tpu.engine.eval import validate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.models import build_model_from_cfg

    argv = sys.argv[1:]
    votes = 0
    exact = False
    while argv and argv[0].startswith("--"):
        if argv[0] == "--votes":
            votes = int(argv[1])
            argv = argv[2:]
        elif argv[0] == "--exact":
            # evaluate every member and ensemble in the EXACT topology (no
            # fast_pyramid/fast_graph) — the all-fast artifacts are
            # topology-robust, so this measures the exact-mode ensemble
            exact = True
            argv = argv[1:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    ckpts = ({os.path.basename(p.rstrip("/")): p for p in argv}
             if argv else {k: os.path.join(REPO, v)
                           for k, v in DEFAULT_CKPTS.items()})

    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, CFG_RUN, "cfg.yaml"))
    seg = dict(cfg.model.segmentor_args)
    seg.pop("pretrained_path", None)
    if exact:
        seg.pop("fast_pyramid", None)
        seg.pop("fast_graph", None)
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": seg})
    base_step = make_eval_step(model)

    def ensemble_step(members, batch):
        # log of the mean softmax: validate()'s own softmax re-normalises it,
        # so argmax/metrics see exactly the mean-probability ensemble (the
        # same trick tta_vote_logits uses for augmentation averaging)
        probs = None
        for v in members:
            p = jax.nn.softmax(base_step(v, batch), axis=-1)
            probs = p if probs is None else probs + p
        return jnp.log(probs / len(members) + 1e-12)

    val_loader = build_dataloader_from_cfg(
        cfg.get("batch_size_val", 2), cfg.dataset_l, cfg.get("dataloader"),
        cfg.get("datatransforms"), split="val", seed=cfg.get("seed", 0))
    vote_t = (build_transforms_from_cfg("vote", cfg.datatransforms)
              if votes else None)

    members = {name: load_variables(p) for name, p in ckpts.items()}
    res = {"checkpoints": ckpts, "votes": votes,
           "topology": "exact" if exact else "fast", "members": {},
           "ensembles": {}}
    for name, v in members.items():
        m = validate(base_step, v, val_loader, cfg)
        res["members"][name] = {k: round(float(x), 4) for k, x in m.items()}
        print(name, res["members"][name])

    names = list(members)
    jobs = [(names[:k], 0) for k in range(2, len(names) + 1)]
    if votes:
        jobs.append((names, votes))       # votes stack on top of the ensemble
    for sub, nv in jobs:
        tag = "+".join(sub) + (f"@vote{nv}" if nv else "")
        m = validate(ensemble_step, tuple(members[n] for n in sub),
                     val_loader, cfg, num_votes=nv,
                     data_transform=vote_t if nv else None)
        res["ensembles"][tag] = {k2: round(float(x), 4) for k2, x in m.items()}
        print(tag, res["ensembles"][tag])

    out = os.path.join(REPO, "log", "ensemble_eval_exact.json" if exact
                       else "ensemble_eval.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    best = max(res["ensembles"].values(), key=lambda d: d["whole_miou"])
    print(json.dumps({"best_ensemble_whole_miou": best["whole_miou"]}))


if __name__ == "__main__":
    main()
