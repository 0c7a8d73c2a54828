"""Parity of the deterministic transforms against the reference's own
implementations (``openpoints/transforms/point_transformer_gpu.py``), loaded
as test-time oracles; skipped when /root/reference is absent."""
import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/openpoints/transforms"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

from geot_tpu.data.transforms import DataTransforms  # noqa: E402


def _load_ref():
    from test_loss_parity_torch import _StubRegistry

    if "openpoints.transforms" not in sys.modules:
        op = sys.modules.get("openpoints") or types.ModuleType("openpoints")
        op.__path__ = getattr(op, "__path__", [])
        sys.modules.setdefault("openpoints", op)
        if "openpoints.utils.registry" not in sys.modules:
            reg = types.ModuleType("openpoints.utils.registry")
            reg.Registry = _StubRegistry
            utils = sys.modules.get("openpoints.utils") \
                or types.ModuleType("openpoints.utils")
            utils.registry = reg
            sys.modules.setdefault("openpoints.utils", utils)
            sys.modules["openpoints.utils.registry"] = reg
        tr = types.ModuleType("openpoints.transforms")
        tr.__path__ = [REF]
        sys.modules["openpoints.transforms"] = tr
    return importlib.import_module(
        "openpoints.transforms.point_transformer_gpu")


@pytest.mark.parametrize("append_xyz,gravity_dim", [(False, 1), (False, 2),
                                                    (True, 2)])
def test_center_and_normalize_matches_reference(append_xyz, gravity_dim):
    mod = _load_ref()
    rng = np.random.default_rng(0)
    pos = (rng.standard_normal((200, 3)) * 3 + 1).astype(np.float32)

    ref_t = mod.PointCloudCenterAndNormalize(append_xyz=append_xyz,
                                             gravity_dim=gravity_dim)
    ref_data = ref_t({"pos": torch.tensor(pos)})

    our_t = DataTransforms.build({"NAME": "PointCloudCenterAndNormalize",
                                  "append_xyz": append_xyz,
                                  "gravity_dim": gravity_dim})
    our_data = our_t({"pos": pos.copy()}, np.random.default_rng(1))

    np.testing.assert_allclose(our_data["pos"], ref_data["pos"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(our_data["heights"],
                               ref_data["heights"].numpy(), atol=1e-6)
