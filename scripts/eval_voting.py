"""TTA-voting evaluation artifact (reference ``validate`` with ``num_votes``,
``examples/segmentation/train.py:365-375``): no-vote vs N-vote metrics from a
committed checkpoint, written to ``log/voting_eval.json``.

TPU, serial:

    python scripts/eval_voting.py [run_dir] [num_votes]

Defaults to the committed params-only serving checkpoint
(``log/tooth_semi/serving_ft_fastgraph-seed42-ep315``), so the artifact is
re-verifiable from the repo alone.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_RUN = "log/tooth_semi/serving_ft_fastgraph-seed42-ep315"


def main():
    from geot_tpu.core.config import EasyConfig
    from geot_tpu.data import build_dataloader_from_cfg
    from geot_tpu.data.transforms import build_transforms_from_cfg
    from geot_tpu.engine.checkpoint import load_variables
    from geot_tpu.engine.eval import validate
    from geot_tpu.engine.steps import make_eval_step
    from geot_tpu.models import build_model_from_cfg

    run = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_RUN
    votes = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = EasyConfig()
    cfg.load(os.path.join(run, "cfg.yaml"))
    from geot_tpu.engine.checkpoint import discover_checkpoint
    ckpt = discover_checkpoint(run)
    variables = load_variables(ckpt)

    cfg.model.segmentor_args.pop("pretrained_path", None)
    model = build_model_from_cfg(cfg.model)
    step = make_eval_step(model)
    val_loader = build_dataloader_from_cfg(
        cfg.get("batch_size_val", 2), cfg.dataset_l, cfg.get("dataloader"),
        cfg.get("datatransforms"), split="val", seed=cfg.get("seed", 0))
    vote_t = build_transforms_from_cfg("vote", cfg.datatransforms)

    res = {"checkpoint": ckpt, "num_votes": votes, "modes": {}}
    for tag, nv in [("no_vote", 0), (f"vote_{votes}", votes)]:
        m = validate(step, variables, val_loader, cfg, num_votes=nv,
                     data_transform=vote_t if nv else None)
        res["modes"][tag] = {k: round(float(v), 4) for k, v in m.items()}
        print(tag, res["modes"][tag])
    res["miou_gain"] = round(res["modes"][f"vote_{votes}"]["whole_miou"]
                             - res["modes"]["no_vote"]["whole_miou"], 4)

    out = os.path.join(os.path.dirname(__file__), "..", "log",
                       "voting_eval.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({"miou_gain": res["miou_gain"]}))


if __name__ == "__main__":
    main()
