"""EasyConfig semantics (reference ``openpoints/utils/config.py:18-120``) —
the north star requires the reference's cfgs to parse identically."""
import os

import pytest

from geot_tpu.core.config import EasyConfig

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfgs", "tooth_semi")


def _flagship():
    cfg = EasyConfig()
    cfg.load(os.path.join(CFG_DIR, "transformer_finetune_fixmatch_ntm.yaml"),
             recursive=True)
    return cfg


def test_recursive_default_merge():
    """The experiment yaml recursively merges parent default.yaml: keys only
    in default (val_freq) and keys overridden by the experiment (epochs'
    decay) must both resolve."""
    cfg = _flagship()
    assert cfg.val_freq == 250                    # from default.yaml only
    assert cfg.decay_epochs == [220]              # experiment overrides [210, 270]
    assert cfg.model.segmentor_args.trans_dim == 384


def test_nested_merge_not_replace():
    """Merging goes key-by-key into nested dicts (reference ``load``):
    datatransforms.kwargs holds the union of both files' kwargs."""
    cfg = _flagship()
    kw = cfg.datatransforms.kwargs
    assert "jitter_sigma" in kw and "angle_s" in kw


def test_cli_overrides_literal_eval_and_dotted():
    cfg = _flagship()
    cfg.update(["lr=0.005", "model.segmentor_args.depth=6",
                "decay_epochs=[100,200]", "pretrained_path=some/path.pth",
                "use_3d_loss=False"])
    assert cfg.lr == 0.005 and isinstance(cfg.lr, float)
    assert cfg.model.segmentor_args.depth == 6
    assert cfg.decay_epochs == [100, 200]
    assert cfg.pretrained_path == "some/path.pth"   # non-literal stays str
    assert cfg.use_3d_loss is False


def test_cli_override_creates_new_keys():
    cfg = EasyConfig()
    cfg.update({"a": {"b": 1}})   # dict update converts nested levels
    cfg.update(["a.c=2", "brand_new=3"])
    assert cfg.a.c == 2 and cfg.a.b == 1
    assert cfg.brand_new == 3


def test_attr_access_and_get():
    # like the reference, the CONSTRUCTOR stores plain nested dicts; only
    # update(dict)/load convert nested levels to EasyConfig
    cfg = EasyConfig()
    cfg.update({"x": {"y": 5}})
    assert cfg.x.y == 5
    assert cfg.get("missing") is None
    with pytest.raises(AttributeError):
        _ = cfg.missing_attr


def test_dict_roundtrip_plain():
    cfg = _flagship()
    d = cfg.dict()
    assert type(d) is dict
    assert type(d["model"]) is dict               # fully plain for yaml.dump


def test_hash_is_deterministic():
    a, b = _flagship(), _flagship()
    if hasattr(a, "hash"):
        assert a.hash() == b.hash()
