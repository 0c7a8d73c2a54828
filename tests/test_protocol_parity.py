"""Driver-protocol parity (VERDICT r2 #5): the reported test metric must come
from the best-val checkpoint (reference ``train.py:350-352``), the confusion
cm bootstrap is selectable, and the wandb facade captures git state."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.core.config import EasyConfig


@pytest.mark.slow
def test_test_eval_uses_best_checkpoint(tmp_path, monkeypatch):
    """Force the best epoch to be the FIRST val by fabricating decreasing val
    metrics; the test evaluation must then run on epoch-1's saved weights,
    not the final state."""
    import geot_tpu.engine.train as train_mod

    fake_miou = iter([0.9, 0.5, 0.4])        # val@1 best, val@2/3 worse
    recorded = []

    def fake_validate(eval_step, variables, loader, cfg, logger=None, **kw):
        m = next(fake_miou, 0.1)
        recorded.append(jax.tree_util.tree_map(np.asarray, variables))
        return {"whole_miou": m, "whole_dsc": m, "whole_acc": m,
                "mandible_miou": m, "mandible_dsc": m, "mandible_acc": m,
                "maxillary_miou": m, "maxillary_dsc": m, "maxillary_acc": m,
                "sampled_acc": m}

    monkeypatch.setattr(train_mod, "validate", fake_validate)

    cfg = EasyConfig()
    cfg.load(os.path.join(os.path.dirname(__file__), "..",
                          "cfgs", "tooth_semi", "smoke.yaml"), recursive=True)
    cfg.run_dir = str(tmp_path / "run")
    cfg.ckpt_dir = str(tmp_path / "run" / "checkpoint")
    cfg.run_name = "bestckpt"
    cfg.epochs = 2
    cfg.val_freq = 1
    cfg.test_freq = 2
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    results = train_mod.main(cfg)

    # call order: val@1, val@2, test@2 -> best saved at epoch 1
    assert len(recorded) == 3
    from geot_tpu.engine.checkpoint import _ckpt_path, load_variables

    best_vars = jax.tree_util.tree_map(
        np.asarray, load_variables(_ckpt_path(cfg.ckpt_dir, cfg.run_name,
                                              "best")))
    test_vars, final_val_vars = recorded[2], recorded[1]

    flat_best = jax.tree_util.tree_leaves(best_vars["params"])
    flat_test = jax.tree_util.tree_leaves(test_vars["params"])
    flat_final = jax.tree_util.tree_leaves(final_val_vars["params"])
    for b, t in zip(flat_best, flat_test):
        np.testing.assert_allclose(b, t)
    assert any(not np.allclose(b, f) for b, f in zip(flat_best, flat_final)), \
        "epoch-2 params should differ from the saved best (epoch-1) params"
    assert results["best"]["epoch"] == 1


def test_cal_confusion_rows(rng):
    """``cal_confusion`` (reference ``cal_confusion_matrix``,
    ``train.py:841-866``): counts match a direct confusion computation and
    rows are normalised."""
    from geot_tpu.engine.train import cal_confusion

    C, B, N = 5, 2, 64
    logits = rng.standard_normal((B, N, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, N))

    def fake_step(variables, batch):
        pred = np.argmax(logits, -1).reshape(-1)
        tgt = batch["y"].reshape(-1)
        cm = np.zeros((C, C))
        for t, p in zip(np.asarray(tgt), pred):
            cm[t, p] += 1
        return jnp.asarray(cm)

    batch = {"pos": np.zeros((B, N, 3), np.float32),
             "x": np.zeros((B, N, 3), np.float32),
             "cls": np.zeros((B, 1), np.int64),
             "y": labels, "class_weights": np.ones((B, C), np.float32)}
    cm = np.asarray(cal_confusion(fake_step, None, [batch], C,
                                  lambda d: d))
    row_counts = np.bincount(labels.reshape(-1), minlength=C)
    expect = np.zeros((C, C))
    pred = np.argmax(logits, -1).reshape(-1)
    for t, p in zip(labels.reshape(-1), pred):
        expect[t, p] += 1
    np.testing.assert_allclose(cm, expect / (row_counts[:, None] + 0.001),
                               atol=1e-6)


def test_make_confusion_step_counts(rng):
    """The jitted confusion step produces exact label-x-pred counts."""
    from geot_tpu.engine.steps import make_confusion_step

    C = 4

    class Fake:
        def apply(self, variables, batch, training=False):
            return (jnp.asarray(variables["logits"]),)

    step = make_confusion_step(Fake(), C)
    logits = rng.standard_normal((2, 32, C)).astype(np.float32)
    y = rng.integers(0, C, (2, 32))
    cm = np.asarray(step({"logits": logits}, {"y": jnp.asarray(y)}))
    expect = np.zeros((C, C))
    for t, p in zip(y.reshape(-1), np.argmax(logits, -1).reshape(-1)):
        expect[t, p] += 1
    np.testing.assert_allclose(cm, expect)


def test_git_state_captures_repo_sha():
    from geot_tpu.engine.writer import git_state

    st = git_state(os.path.dirname(__file__))
    assert set(st) == {"commit", "gitdiff"}
    assert st["commit"] == "n/a" or len(st["commit"]) == 40
