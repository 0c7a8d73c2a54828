"""Visualisation surface (reference ``openpoints/dataset/vis3d.py``,
``vis2d.py``) — headless file-rendering ports."""
import os

import numpy as np
import pytest

from geot_tpu.utils import (read_obj, show_imgs, vis_multi_points,
                            vis_neighbors, vis_points, write_obj)


def test_vis3d_surface(tmp_path):
    rng = np.random.default_rng(0)
    pts = [rng.standard_normal((100, 3)), rng.standard_normal((80, 3))]
    labs = [rng.integers(0, 17, 100), None]
    paths = vis_multi_points(pts, labels=labs, out_dir=str(tmp_path),
                             save_fig=True)
    assert all(os.path.exists(p) for p in paths)
    assert paths[-1].endswith(".png")
    assert os.path.exists(vis_points(pts[0], out=str(tmp_path / "p.ply")))
    assert os.path.exists(vis_neighbors(pts[0], pts[0][:5], 3,
                                        out_dir=str(tmp_path)))


def test_obj_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    cols = rng.random((50, 3)).astype(np.float32)
    f = str(tmp_path / "x.obj")
    write_obj(pts, cols, f)
    rp, rc = read_obj(f)
    np.testing.assert_allclose(rp, pts, atol=1e-5)
    np.testing.assert_allclose(rc, cols, atol=1e-5)


def test_show_imgs_chw_and_hwc(tmp_path):
    rng = np.random.default_rng(0)
    out = show_imgs([rng.random((16, 16, 3)), rng.random((3, 16, 16))],
                    out=str(tmp_path / "i.png"))
    assert os.path.exists(out)
