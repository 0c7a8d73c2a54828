"""The COMMITTED serving checkpoint must stay loadable and functional.

Guards the evidence artifact (log/tooth_semi/serving_ft_fastgraph-seed42-
ep315) against parameter-tree drift: a rename anywhere in the flagship model
breaks orbax restore of the committed params, invalidating every committed
quality number.  Forward runs at a reduced point count (the model is
shape-polymorphic) to keep CPU time sane.
"""
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
RUN = os.path.join(ROOT, "log", "tooth_semi", "serving_ft_fastgraph-seed42-ep315")
CKPT = os.path.join(RUN, "checkpoint", "serving_ft_fastgraph_params_only")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CKPT), reason="artifact not present")
def test_committed_serving_checkpoint_loads_and_predicts():
    import jax
    import jax.numpy as jnp

    from geot_tpu.core.config import EasyConfig
    from geot_tpu.engine.checkpoint import load_variables
    from geot_tpu.models import build_model_from_cfg

    cfg = EasyConfig()
    cfg.load(os.path.join(RUN, "cfg.yaml"))
    variables = load_variables(CKPT)
    model = build_model_from_cfg(cfg.model)

    # the restored tree must be exactly the tree the current model builds
    init_pos = jnp.zeros((1, 2048, 3))
    ref = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           {"pos": init_pos, "x": init_pos,
                            "cls": jnp.zeros((1, 1), jnp.int32)}))
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     variables["params"])[0]}
    want_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(
                      ref["params"])[0]}
    assert got_paths == want_paths, (
        f"param-tree drift vs committed artifact: "
        f"missing={sorted(want_paths - got_paths)[:5]} "
        f"extra={sorted(got_paths - want_paths)[:5]}")

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((1, 2048, 3)).astype(np.float32) * 0.4)
    logits, *_ = model.apply(variables, {"pos": pos, "x": pos,
                                         "cls": jnp.zeros((1, 1), jnp.int32)})
    labels = np.asarray(jnp.argmax(logits[0], -1))
    assert np.all(labels >= 0) and np.all(labels < 17)
    # trained weights produce a non-degenerate labelling even on noise
    assert len(np.unique(labels)) > 1


@pytest.mark.slow
def test_resume_from_params_only_checkpoint(tmp_path):
    """load_checkpoint grafts params-only artifacts onto a fresh state:
    params/batch_stats restore, optimizer state keeps template values —
    so ``mode=resume pretrained_path=<params-only ckpt>`` fine-tunes."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from geot_tpu.engine.checkpoint import load_checkpoint
    from geot_tpu.engine.state import TrainState
    from geot_tpu.models import build_model_from_cfg
    from geot_tpu.optim import build_optimizer_from_cfg

    seg = dict(NAME="PointTransformer_seg_T", trans_dim=48, depth=3,
               num_heads=4, group_size=8, num_group=16, encoder_dims=32,
               nclasses=17, drop_path_rate=0.0, downsample_targets=[64, 32, 16],
               extract_layers=[1, 2, 3])
    model = build_model_from_cfg({"NAME": "WholePartSeg", "segmentor_args": seg})
    pos = jnp.zeros((1, 64, 3))
    batch = {"pos": pos, "x": pos, "cls": jnp.zeros((1, 1), jnp.int32)}
    key = jax.random.PRNGKey(0)
    v0 = jax.jit(model.init)({"params": key,
                              "dropout": jax.random.fold_in(key, 1)}, batch)
    # a params-only artifact with recognisably-different params
    bumped = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, v0["params"])
    ckptr = ocp.StandardCheckpointer()
    path = str(tmp_path / "params_only")
    ckptr.save(path, {"state": {"params": bumped,
                                "batch_stats": jax.tree_util.tree_map(
                                    np.asarray, v0["batch_stats"])},
                      "epoch": 7})
    ckptr.wait_until_finished()

    tx = build_optimizer_from_cfg(None, lr=1e-3, NAME="adamw")
    template = TrainState.create(v0, tx)
    state, epoch, extra = load_checkpoint(path, template)
    assert epoch == 7 and extra == {}
    got = jax.tree_util.tree_leaves(state.params)[0]
    want = jax.tree_util.tree_leaves(bumped)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    # optimizer state untouched (fresh template values)
    t0 = jax.tree_util.tree_leaves(template.opt_state)
    s0 = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(t0, s0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
