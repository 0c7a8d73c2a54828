"""Reference driver modes beyond train/resume: eval-only ``mode=val/test``
(``examples/segmentation/train.py:191-197``) and ``mode=finetune`` /
``mode=finetune_encoder`` weight grafts (``train.py:198-203``).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geot_tpu.core.config import EasyConfig
from geot_tpu.engine.checkpoint import graft_variables

HERE = os.path.dirname(__file__)


def _smoke_cfg(tmp_path, name):
    cfg = EasyConfig()
    cfg.load(os.path.join(HERE, "..", "cfgs", "tooth_semi", "smoke.yaml"),
             recursive=True)
    cfg.run_dir = str(tmp_path / name)
    cfg.ckpt_dir = str(tmp_path / name / "checkpoint")
    cfg.run_name = name
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    return cfg


class TestGraftVariables:
    def _vars(self, seed, extra_key=False):
        k = jax.random.PRNGKey(seed)
        v = {"params": {"encoder": {"w": jax.random.normal(k, (4, 4))},
                        "head": {"w": jax.random.normal(k, (4, 2))}},
             "batch_stats": {"encoder": {"mean": jnp.zeros((4,))}}}
        if extra_key:
            v["params"]["oddball"] = {"w": jnp.zeros((1,))}
        return v

    def test_full_graft(self):
        fresh, saved = self._vars(0), self._vars(1)
        out, skipped = graft_variables(fresh, saved)
        assert not skipped
        np.testing.assert_array_equal(out["params"]["head"]["w"],
                                      saved["params"]["head"]["w"])
        # input untouched (deepcopy semantics)
        assert not np.array_equal(fresh["params"]["head"]["w"],
                                  out["params"]["head"]["w"])

    def test_encoder_only(self):
        fresh, saved = self._vars(0), self._vars(1)
        out, _ = graft_variables(fresh, saved, only_subtree="encoder")
        np.testing.assert_array_equal(out["params"]["encoder"]["w"],
                                      saved["params"]["encoder"]["w"])
        np.testing.assert_array_equal(out["params"]["head"]["w"],
                                      fresh["params"]["head"]["w"])

    def test_shape_mismatch_and_unexpected_skipped(self):
        fresh, saved = self._vars(0), self._vars(1, extra_key=True)
        saved["params"]["head"]["w"] = jnp.zeros((3, 2))
        out, skipped = graft_variables(fresh, saved)
        assert any("head/w" in s for s in skipped)
        assert any("oddball" in s for s in skipped)
        np.testing.assert_array_equal(out["params"]["head"]["w"],
                                      fresh["params"]["head"]["w"])

    def test_no_subtree_match_reported(self):
        fresh, saved = self._vars(0), self._vars(1)
        _, skipped = graft_variables(fresh, saved, only_subtree="nonexistent")
        assert any("no top-level module matches" in s for s in skipped)


@pytest.mark.slow
class TestEvalOnlyAndFinetune:
    def test_mode_val_and_finetune(self, tmp_path):
        from geot_tpu.engine.train import main

        # 1 training epoch produces a checkpoint
        cfg = _smoke_cfg(tmp_path, "base")
        cfg.epochs = 1
        cfg.val_freq = 1
        cfg.test_freq = 999
        main(cfg)
        ck = [d for d in os.listdir(cfg.ckpt_dir) if d.endswith("latest")]
        assert ck
        ckpt = os.path.join(cfg.ckpt_dir, ck[0])

        # mode=val: loads the ckpt, validates, returns WITHOUT training
        cfg_v = _smoke_cfg(tmp_path, "evalonly")
        cfg_v.mode = "val"
        cfg_v.pretrained_path = ckpt
        cfg_v.epochs = 50                     # would be slow if it trained
        res = main(cfg_v)
        assert set(res) == {"val"}            # no "best" => no training loop
        assert np.isfinite(res["val"]["whole_acc"])
        assert not os.listdir(cfg_v.ckpt_dir)  # nothing trained/saved

        # mode=finetune: grafts weights, then trains from epoch 1
        cfg_f = _smoke_cfg(tmp_path, "ft")
        cfg_f.mode = "finetune"
        cfg_f.pretrained_path = ckpt
        cfg_f.epochs = 1
        cfg_f.val_freq = 1
        cfg_f.test_freq = 999
        res_f = main(cfg_f)
        assert "best" in res_f                # trained
