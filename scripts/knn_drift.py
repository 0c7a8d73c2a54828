"""Quantify approx-vs-exact kNN drift at flagship scale ON TPU.

Training defaults to ``lax.approx_min_k`` selection (recall_target 0.99);
every parity artifact uses ``exact=True``.  On the CPU backend approx_min_k
lowers to exact top-k, so this measurement is only meaningful on the real
chip.  Writes ``log/knn_drift.json``; ``tests/test_knn_drift_artifact.py``
pins the recorded bounds.

Run (TPU, serial, one process):
``KNN_DRIFT_OUT=log/knn_drift.json python scripts/knn_drift.py``
(the artifact write is opt-in so a CPU run can't clobber the TPU evidence).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import importlib

    import jax
    import jax.numpy as jnp

    # NB: ``geot_tpu.ops.knn`` the ATTRIBUTE is the re-exported function
    # (shadows the submodule); import_module gets the module whose global
    # the knn() trace actually reads
    knn_mod = importlib.import_module("geot_tpu.ops.knn")
    from geot_tpu.models import build_model_from_cfg
    from __graft_entry__ import FLAGSHIP_SEG_ARGS

    backend = jax.default_backend()
    model = build_model_from_cfg({"NAME": "WholePartSeg",
                                  "segmentor_args": dict(FLAGSHIP_SEG_ARGS)})
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    n_clouds = 4
    clouds = [rng.standard_normal((1, 16000, 3)).astype(np.float32) * 0.5
              for _ in range(n_clouds)]
    b0 = {"pos": jnp.asarray(clouds[0]), "x": jnp.asarray(clouds[0]),
          "cls": jnp.zeros((1, 1), jnp.int32)}
    variables = jax.jit(model.init)(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, b0)

    def forward_all(exact: bool):
        knn_mod._EXACT_KNN = exact
        f = jax.jit(lambda v, b: model.apply(v, b)[0])
        outs = []
        for c in clouds:
            b = {"pos": jnp.asarray(c), "x": jnp.asarray(c),
                 "cls": jnp.zeros((1, 1), jnp.int32)}
            outs.append(np.asarray(f(variables, b), dtype=np.float32))
        return np.concatenate(outs)

    t0 = time.time()
    la = forward_all(False)
    le = forward_all(True)
    agree = float((la.argmax(-1) == le.argmax(-1)).mean())
    res = {
        "backend": backend,
        "n_clouds": n_clouds,
        "n_points": 16000,
        "model": "PointTransformer_seg_T D=384 depth=12",
        "recall_target": 0.99,
        "argmax_agreement": agree,
        "max_abs_dlogit": float(np.abs(la - le).max()),
        "mean_abs_dlogit": float(np.abs(la - le).mean()),
        "wall_s": time.time() - t0,
    }
    # Opt-in artifact write (mirrors eval_fast_pyramid.py's FP_EVAL_OUT
    # gating): the committed log/knn_drift.json is TPU evidence — a stray
    # CPU run must not clobber it with a meaningless exact-vs-exact result.
    out = os.environ.get("KNN_DRIFT_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
