"""Audit: every top-level key in the flagship config chain is classified.

Guards against silently-ignored configuration: each key appearing in
``cfgs/tooth_semi/default.yaml`` + ``transformer_finetune_fixmatch_ntm.yaml``
must be either CONSUMED (read somewhere in geot_tpu — spot-verified at
authoring time) or DEAD_IN_REFERENCE (the reference's own code never reads
``cfg.<key>`` either — verified by grep over ``/root/reference`` at authoring
time; we keep the key parseable for config compatibility but ignore it, which
IS the reference behavior).  A new config key fails this test until it is
classified.
"""
import os

import yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi")

CONSUMED = {
    # engine/train.py + steps.py + semi.py
    "epochs", "seed", "model", "model_t", "t_predictor", "pretrained_path",
    "criterion_args", "criterion_u_args", "supervised_epochs", "switch_ep",
    "threshold", "unsupervised_loss_weight", "lambma", "geo_lambma",
    "ema_t_decay", "filter_outlier", "grad_norm_clip", "step_per_update",
    "use_feat_loss", "feat_loss_weight", "feat_k", "feat_sigma",
    "use_3d_loss", "threed_loss_weight", "threed_k", "threed_sigma",
    "threed_anchors",
    "use_identity_loss", "identity_loss_weight",
    "use_contrastive", "contrastive_loss_weight",
    "pseudo_refine", "refine", "print_freq",
    "val_freq", "test_freq", "save_freq", "num_votes", "wandb",
    # optim/factory.py
    "optimizer", "lr", "min_lr", "sched", "sched_on_epoch",
    "decay_epochs", "decay_rate", "warmup_epochs",
    # data/build.py + datasets
    "dataset_l", "dataset_u", "dataset", "dataloader", "datatransforms",
    "batch_size", "batch_size_l", "batch_size_u", "batch_size_val",
    "batch_size_test", "num_points", "num_classes", "shape_classes",
    # engine/eval.py
    "eval_device_cache",
    # run bookkeeping (core/logger.py / CLI)
    "mode", "run_dir", "run_name", "log_dir", "root_dir", "task_name",
    "exp_name", "tags",
}

# Keys present in the YAMLs that the REFERENCE code never reads either
# (grep over /root/reference/examples + openpoints + utils, 2026-08):
DEAD_IN_REFERENCE = {
    "ema_decay",        # no cfg.ema_decay consumer (teacher is frozen)
    "cur_threshold",    # _U_Cur reads its threshold from criterion_u_args
    "feature_keys",     # only a commented-out line (train.py:737)
    "use_voting",       # reference gates voting on cfg.num_votes instead
}


def _chain_keys():
    keys = set()
    for name in ("default.yaml", "transformer_finetune_fixmatch_ntm.yaml"):
        with open(os.path.join(CFG_DIR, name)) as f:
            keys |= set(yaml.safe_load(f).keys())
    return keys


def test_every_cfg_key_is_classified():
    keys = _chain_keys()
    unclassified = keys - CONSUMED - DEAD_IN_REFERENCE
    assert not unclassified, (
        f"unclassified config keys {sorted(unclassified)}: add each to "
        f"CONSUMED (and actually consume it) or DEAD_IN_REFERENCE (after "
        f"verifying the reference ignores it too)")


def test_no_stale_classifications():
    # classifications must not outlive the keys they describe
    keys = _chain_keys()
    stale = (DEAD_IN_REFERENCE - keys)
    assert not stale, f"DEAD_IN_REFERENCE lists keys absent from cfgs: {stale}"


def test_fast_variant_is_flagship_plus_flags():
    """transformer_finetune_fixmatch_ntm_fast.yaml must stay key-identical to
    the flagship except the two serving-topology flags."""
    with open(os.path.join(CFG_DIR,
                           "transformer_finetune_fixmatch_ntm.yaml")) as f:
        base = yaml.safe_load(f)
    with open(os.path.join(CFG_DIR,
                           "transformer_finetune_fixmatch_ntm_fast.yaml")) as f:
        fast = yaml.safe_load(f)
    seg = dict(fast["model"]["segmentor_args"])
    assert seg.pop("fast_pyramid") == 1024
    assert seg.pop("fast_graph") is True
    fast["model"] = dict(fast["model"], segmentor_args=seg)
    assert fast == base, "fast variant drifted from the flagship config"
