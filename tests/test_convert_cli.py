"""geot-convert CLI: reference .pth -> params-only orbax artifact.

Reuses the torch oracle from test_parity_torch (reference state_dict layout)
so the CLI is exercised exactly as a migrating user would use it on a real
``{run}_ckpt_best.pth``."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from geot_tpu.engine.checkpoint import (convert_cli, convert_torch_seg_t,
                                        load_variables)
from tests.test_parity_torch import DEPTH, TSegT


def test_convert_cli_roundtrip(tmp_path):
    torch.manual_seed(0)
    oracle = TSegT().eval()
    sd = {"segmentor." + k: v for k, v in oracle.state_dict().items()}
    pth = tmp_path / "ref_ckpt_best.pth"
    # reference save layout: {'model': state_dict, ...} (ckpt_util.py:69-108)
    torch.save({"model": sd, "epoch": 300}, pth)

    out = convert_cli([str(pth), str(tmp_path / "artifact"),
                       "--depth", str(DEPTH)])

    v = load_variables(out)
    assert set(v) == {"params", "batch_stats"}

    # the artifact carries the full save_checkpoint payload shape so
    # load_checkpoint / mode=resume can consume it too (round-3 review:
    # a state-only payload KeyError'd in the documented resume workflow)
    import orbax.checkpoint as ocp

    payload = ocp.StandardCheckpointer().restore(out)
    assert payload["epoch"] == 300
    assert "extra" in payload
    params, stats = convert_torch_seg_t(
        {k: t.numpy() for k, t in sd.items()}, depth=DEPTH)
    import jax

    direct = jax.tree_util.tree_leaves(params)
    loaded = jax.tree_util.tree_leaves(v["params"])
    assert len(direct) == len(loaded)
    for a, b in zip(direct, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
