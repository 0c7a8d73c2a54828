"""The COMMITTED supervised-zoo checkpoints must stay loadable and match the
current model trees (same guard as ``test_serving_ckpt`` for the flagship).

Evidence artifacts: ``log/tooth_sup/ZOO.md`` — params-only best checkpoints
for the PointNet++ and DGCNN 100-epoch runs.
"""
import glob
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _find(pattern, ckpt_name):
    runs = glob.glob(os.path.join(ROOT, "log", "tooth_sup", pattern))
    for r in runs:
        p = os.path.join(r, "checkpoint", ckpt_name)
        if os.path.isdir(p):
            return r, p
    return None, None


@pytest.mark.parametrize("pattern,ckpt_name", [
    ("*pointnet2*", "pointnet2_sup_best_params_only"),
    ("*dgcnn*", "dgcnn_sup_best_params_only"),
])
def test_committed_zoo_checkpoint_loads(pattern, ckpt_name):
    run, ckpt = _find(pattern, ckpt_name)
    if ckpt is None:
        pytest.skip("artifact not present")
    import jax
    import jax.numpy as jnp

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.checkpoint import load_variables
    from geot_tpu.models import build_model_from_cfg

    cfg = EasyConfig()
    cfg.load(os.path.join(run, "cfg.yaml"))
    variables = load_variables(ckpt)
    model = build_model_from_cfg(cfg.model)

    init_pos = jnp.zeros((1, 1024, 3))
    ref = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           {"pos": init_pos, "x": init_pos,
                            "cls": jnp.zeros((1, 1), jnp.int32)}))
    got = {jax.tree_util.keystr(p) for p, _ in
           jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    want = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    assert got == want, (f"param-tree drift vs committed zoo artifact "
                         f"{ckpt_name}: missing={sorted(want - got)[:5]} "
                         f"extra={sorted(got - want)[:5]}")
