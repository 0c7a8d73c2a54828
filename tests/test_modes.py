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

    def test_missing_from_checkpoint_reported(self):
        """Model leaves absent from the checkpoint keep random init — that
        must be REPORTED (round-3 review: a smaller-config ckpt grafted into
        a bigger model published eval metrics from partially-random weights
        with zero warning)."""
        fresh, saved = self._vars(0), self._vars(1)
        del saved["params"]["head"]          # ckpt lacks the whole head
        out, skipped = graft_variables(fresh, saved)
        assert any(s == "params/head/w (missing from checkpoint)"
                   for s in skipped)
        np.testing.assert_array_equal(out["params"]["head"]["w"],
                                      fresh["params"]["head"]["w"])
        # a shape-mismatch leaf is reported once (as a mismatch), not also
        # as missing
        fresh2, saved2 = self._vars(0), self._vars(1)
        saved2["params"]["head"]["w"] = jnp.zeros((3, 2))
        _, skipped2 = graft_variables(fresh2, saved2)
        assert sum("head/w" in s for s in skipped2) == 1

    def test_no_subtree_match_reported(self):
        fresh, saved = self._vars(0), self._vars(1)
        _, skipped = graft_variables(fresh, saved, only_subtree="nonexistent")
        assert any("no module path matches" in s for s in skipped)

    def test_subtree_matches_nested_modules(self):
        """mode=finetune_encoder must reach 'encoder' nested under the
        flagship's top-level 'segmentor' module (round-3 review finding:
        the top-level-only filter silently grafted nothing)."""
        k = jax.random.PRNGKey(0)

        def vars_(seed):
            k = jax.random.PRNGKey(seed)
            return {"params": {"segmentor": {
                "encoder": {"w": jax.random.normal(k, (4, 4))},
                "head": {"w": jax.random.normal(k, (4, 2))}}}}

        fresh, saved = vars_(0), vars_(1)
        grafted_paths = []
        out, skipped = graft_variables(fresh, saved, only_subtree="encoder",
                                       grafted_paths=grafted_paths)
        assert grafted_paths == ["params/segmentor/encoder/w"]
        assert not any("no module path" in s for s in skipped)
        np.testing.assert_array_equal(out["params"]["segmentor"]["encoder"]["w"],
                                      saved["params"]["segmentor"]["encoder"]["w"])
        np.testing.assert_array_equal(out["params"]["segmentor"]["head"]["w"],
                                      fresh["params"]["segmentor"]["head"]["w"])


@pytest.mark.slow
class TestEvalOnlyAndFinetune:
    @pytest.mark.slow
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

        # mode=test: evaluates the TEST split (round-3 review finding: it
        # used to silently evaluate val) and keys the result accordingly
        cfg_t = _smoke_cfg(tmp_path, "testonly")
        cfg_t.mode = "test"
        cfg_t.pretrained_path = ckpt
        res_t = main(cfg_t)
        assert set(res_t) == {"test"}
        assert np.isfinite(res_t["test"]["whole_acc"])

        # eval-only with a missing/invalid checkpoint path must refuse, not
        # report metrics of randomly-initialised weights
        cfg_b = _smoke_cfg(tmp_path, "badpath")
        cfg_b.mode = "val"
        cfg_b.pretrained_path = str(tmp_path / "nonexistent")
        with pytest.raises(FileNotFoundError):
            main(cfg_b)
        cfg_n = _smoke_cfg(tmp_path, "nopath")
        cfg_n.mode = "val"
        cfg_n.pretrained_path = None
        with pytest.raises(ValueError):
            main(cfg_n)

        # mode=resume with a missing checkpoint dir must refuse instead of
        # silently retraining from scratch (and overwriting *_ckpt_best)
        cfg_r = _smoke_cfg(tmp_path, "badresume")
        cfg_r.mode = "resume"
        cfg_r.pretrained_path = str(tmp_path / "gone")
        with pytest.raises(FileNotFoundError):
            main(cfg_r)

        # mode=finetune: grafts weights, then trains from epoch 1
        cfg_f = _smoke_cfg(tmp_path, "ft")
        cfg_f.mode = "finetune"
        cfg_f.pretrained_path = ckpt
        cfg_f.epochs = 1
        cfg_f.val_freq = 1
        cfg_f.test_freq = 999
        res_f = main(cfg_f)
        assert "best" in res_f                # trained
