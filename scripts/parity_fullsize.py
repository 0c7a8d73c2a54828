"""Full-size checkpoint-parity artifact (VERDICT r1 item 5 / BASELINE north
star): flagship dims (trans_dim 384, depth 12, 16k points, exact kNN), torch
oracle vs geot_tpu through the ``.pth`` converter.

Reuses the reference-named torch oracle from ``tests/test_parity_torch.py``
(module-level dims are overridden to flagship scale before instantiation) so
``convert_torch_seg_t`` is exercised exactly as a real reference checkpoint
would be (reference eval protocol: ``examples/segmentation/train.py:781-832``).

Writes ``log/parity_fullsize.json`` with max/mean |dlogit|, argmax agreement
and the mIoU delta of the two predictions against a random labelling (the
sampled-protocol statistic).  Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu GEOT_EXACT_KNN=1 \
        python scripts/parity_fullsize.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("GEOT_EXACT_KNN", "1")

import tests.test_parity_torch as tp  # noqa: E402  (the shared torch oracle)

# flagship dims (cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml)
tp.D, tp.DEPTH, tp.HEADS = 384, 12, 4
tp.GROUPS, tp.GSIZE, tp.ENC, tp.NCLS = 512, 32, 256, 17
tp.N, tp.B = 16000, 1
tp.TARGETS, tp.EXTRACT = [8192, 4096, 2048], [4, 8, 12]


def main():
    import torch
    import torch.nn as tnn
    import jax.numpy as jnp

    from geot_tpu.engine.checkpoint import convert_torch_seg_t
    from geot_tpu.models import build_model_from_cfg

    torch.manual_seed(0)
    t0 = time.time()
    oracle = tp.TSegT().eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.05, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    sd = {"segmentor." + k: v for k, v in oracle.state_dict().items()}
    params, stats = convert_torch_seg_t(sd, depth=tp.DEPTH)
    print(f"oracle + convert: {time.time() - t0:.1f}s", flush=True)

    model = build_model_from_cfg({
        "NAME": "WholePartSeg",
        "segmentor_args": {
            "NAME": "PointTransformer_seg_T", "trans_dim": tp.D,
            "depth": tp.DEPTH, "num_heads": tp.HEADS, "group_size": tp.GSIZE,
            "num_group": tp.GROUPS, "encoder_dims": tp.ENC,
            "nclasses": tp.NCLS, "drop_path_rate": 0.1,
            "downsample_targets": tp.TARGETS, "extract_layers": tp.EXTRACT}})

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((tp.B, tp.N, 3)).astype(np.float32)
    cls = np.zeros((tp.B, 1), dtype=np.int64)

    t0 = time.time()
    with torch.no_grad():
        t_logit, _ = oracle(torch.from_numpy(pts), torch.from_numpy(cls), None)
    t_logit = t_logit.transpose(1, 2).numpy()
    print(f"torch fwd: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    variables = {"params": params, "batch_stats": stats}
    batch = {"pos": jnp.asarray(pts), "x": jnp.asarray(pts),
             "cls": jnp.asarray(cls)}
    j_logit = np.asarray(model.apply(variables, batch)[0])
    print(f"jax fwd: {time.time() - t0:.1f}s", flush=True)

    diff = np.abs(j_logit - t_logit)
    agree = float((j_logit.argmax(-1) == t_logit.argmax(-1)).mean())
    # mIoU delta of the two predictions against the same reference labelling
    # (the sampled-protocol metric; labels random -> deltas isolate pred diff)
    y = rng.integers(0, tp.NCLS, (tp.B, tp.N))

    def miou(pred):
        ious = []
        for c in range(tp.NCLS):
            inter = np.sum((pred == c) & (y == c))
            union = np.sum((pred == c) | (y == c))
            if union:
                ious.append(inter / union)
        return float(np.mean(ious))

    res = {
        "dims": {"D": tp.D, "depth": tp.DEPTH, "heads": tp.HEADS,
                 "points": tp.N, "groups": tp.GROUPS, "exact_knn": True},
        "max_abs_dlogit": float(diff.max()),
        "mean_abs_dlogit": float(diff.mean()),
        "logit_scale_p99": float(np.percentile(np.abs(t_logit), 99)),
        "argmax_agreement": agree,
        "miou_torch": miou(t_logit.argmax(-1)),
        "miou_jax": miou(j_logit.argmax(-1)),
    }
    res["miou_delta"] = abs(res["miou_torch"] - res["miou_jax"])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "log", "parity_fullsize.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
