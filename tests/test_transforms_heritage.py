"""Parity + behavioural tests for the openpoints-heritage transforms added in
round 3 (reference ``point_transform_cpu.py`` / ``point_transformer_gpu.py``),
using the reference module itself as a numpy/torch oracle where the behaviour
is deterministic, and structural checks for the stochastic ones."""
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


def _load_ref_cpu():
    from test_transform_parity_torch import _load_ref

    _load_ref()  # installs the openpoints.transforms stub package
    return importlib.import_module(
        "openpoints.transforms.point_transform_cpu")


def _load_ref_gpu():
    from test_transform_parity_torch import _load_ref

    return _load_ref()


def rng():
    return np.random.default_rng(0)


def test_all_reference_transform_names_registered():
    """The full reference transform registry builds here (VERDICT r2 #2)."""
    import re

    names = set()
    for fn in ("point_transform_cpu.py", "point_transformer_gpu.py"):
        src = open(os.path.join(REF, fn)).read()
        names |= set(re.findall(
            r"@DataTransforms\.register_module\(\)\s*\nclass (\w+)", src))
    missing = sorted(n for n in names if n not in DataTransforms._module_dict)
    assert not missing, f"unregistered reference transforms: {missing}"
    for n in sorted(names):
        assert DataTransforms.build({"NAME": n}) is not None


def test_random_rotate_z_matrix_matches_scipy_expm():
    """Fixed-angle RandomRotateZ must reproduce the reference's
    scipy ``expm``-based rotation exactly (``point_transform_cpu.py:53``)."""
    ref = _load_ref_cpu()
    pos = rng().standard_normal((100, 3)).astype(np.float32)
    for dim in (0, 1, 2):
        t_ref = ref.RandomRotateZ(angle=0.37, rotate_dim=dim,
                                  random_rotate=False)
        out_ref = t_ref({"pos": pos.copy()})["pos"]
        t_our = DataTransforms.build({"NAME": "RandomRotateZ", "angle": 0.37,
                                      "rotate_dim": dim,
                                      "random_rotate": False})
        out_our = t_our({"pos": pos.copy()}, rng())["pos"]
        np.testing.assert_allclose(out_our, out_ref, atol=1e-5)


def test_hsv_roundtrip_matches_reference():
    colors = rng().integers(0, 256, (500, 3)).astype(np.float32)
    ref = _load_ref_cpu().HueSaturationTranslation
    from geot_tpu.data.transforms import _hsv_to_rgb, _rgb_to_hsv

    hsv_ref = ref.rgb_to_hsv(colors.copy())
    hsv_our = _rgb_to_hsv(colors.copy())
    np.testing.assert_allclose(hsv_our, hsv_ref, atol=1e-6)
    np.testing.assert_array_equal(_hsv_to_rgb(hsv_our.copy()),
                                  ref.hsv_to_rgb(hsv_ref.copy()))


def test_hue_saturation_identity_at_zero_strength():
    """hue_max=0, saturation_max=0 reduces to an HSV round-trip — compare
    against the reference transform end-to-end (deterministic)."""
    ref = _load_ref_cpu()
    x = rng().integers(0, 256, (200, 3)).astype(np.float32)
    out_ref = ref.HueSaturationTranslation(hue_max=0.0, saturation_max=0.0)(
        {"x": x.copy()})["x"]
    t = DataTransforms.build({"NAME": "HueSaturationTranslation",
                              "hue_max": 0.0, "saturation_max": 0.0})
    out_our = t({"x": x.copy()}, rng())["x"]
    np.testing.assert_allclose(out_our, out_ref, atol=1e-6)


def test_chromatic_auto_contrast_matches_reference():
    ref = _load_ref_cpu()
    x = rng().integers(0, 256, (300, 3)).astype(np.float32)
    np.random.seed(1)          # oracle gate draw: rand() < p=1.0 always
    out_ref = ref.ChromaticAutoContrast(p=1.1, blend_factor=0.6)(
        {"x": x.copy()})["x"]
    t = DataTransforms.build({"NAME": "ChromaticAutoContrast", "p": 1.1,
                              "blend_factor": 0.6})
    out_our = t({"x": x.copy()}, rng())["x"]
    np.testing.assert_allclose(out_our, out_ref, atol=1e-4)


def test_numpy_chromatic_normalize_matches_reference():
    ref = _load_ref_cpu()
    mean, std = [0.5, 0.4, 0.3], [0.2, 0.25, 0.3]
    x = rng().integers(0, 256, (100, 3)).astype(np.float32)
    out_ref = ref.NumpyChromaticNormalize(color_mean=mean, color_std=std)(
        {"x": x.copy()})["x"]
    t = DataTransforms.build({"NAME": "NumpyChromaticNormalize",
                              "color_mean": mean, "color_std": std})
    out_our = t({"x": x.copy()}, rng())["x"]
    np.testing.assert_allclose(out_our, out_ref, atol=1e-6)


def test_xyz_align_matches_reference():
    ref = _load_ref_gpu()
    pos = (rng().standard_normal((150, 3)) * 2 + 3).astype(np.float32)
    out_ref = ref.PointCloudXYZAlign(gravity_dim=2)(
        {"pos": torch.tensor(pos)})["pos"].numpy()
    t = DataTransforms.build({"NAME": "PointCloudXYZAlign", "gravity_dim": 2})
    out_our = t({"pos": pos.copy()}, rng())["pos"]
    np.testing.assert_allclose(out_our, out_ref, atol=1e-6)


def test_random_flip_only_negates_axes():
    t = DataTransforms.build({"NAME": "RandomFlip", "p": 0.5})
    pos = rng().standard_normal((50, 3)).astype(np.float32)
    seen = set()
    for seed in range(20):
        out = t({"pos": pos.copy()}, np.random.default_rng(seed))["pos"]
        sx = np.sign(out[0, 0] / pos[0, 0])
        sy = np.sign(out[0, 1] / pos[0, 1])
        np.testing.assert_allclose(out[:, 0], sx * pos[:, 0])
        np.testing.assert_allclose(out[:, 1], sy * pos[:, 1])
        np.testing.assert_allclose(out[:, 2], pos[:, 2])
        seen.add((sx, sy))
    assert len(seen) > 1, "p=0.5 must produce different flip patterns"


def test_random_jitter_bounded_and_varying():
    t = DataTransforms.build({"NAME": "RandomJitter", "jitter_sigma": 0.02,
                              "jitter_clip": 0.03})
    pos = np.zeros((4000, 3), np.float32)
    out = t({"pos": pos.copy()}, rng())["pos"]
    assert np.abs(out).max() <= 0.03 + 1e-7
    assert 0.01 < out.std() < 0.03


def test_scale_and_jitter_scale_bounds():
    t = DataTransforms.build({"NAME": "RandomScaleAndJitter",
                              "scale": [0.5, 0.6], "jitter_sigma": 0.0,
                              "jitter_clip": 0.0})
    pos = np.ones((10, 3), np.float32)
    out = t({"pos": pos.copy()}, rng())["pos"]
    assert ((out >= 0.5 - 1e-6) & (out <= 0.6 + 1e-6)).all()


def test_scale_and_translate_bounds():
    t = DataTransforms.build({"NAME": "RandomScaleAndTranslate",
                              "scale": [2.0, 2.0], "shift": [0.0, 0.0, 0.0]})
    pos = np.ones((10, 3), np.float32)
    out = t({"pos": pos.copy()}, rng())["pos"]
    np.testing.assert_allclose(out, 2.0, atol=1e-6)


def test_scale_and_translate_s_reads_strong_kwargs():
    """The ``_s`` convention: strength comes from ``scale_s``/``shift_s``
    exactly like the YAML configures weak vs strong branches."""
    t = DataTransforms.build({"NAME": "PointCloudScaleAndTranslate_s",
                              "scale_s": [3.0, 3.0], "scale": [1.0, 1.0],
                              "shift_s": [0.0, 0.0, 0.0],
                              "shift": [9.0, 9.0, 9.0],
                              "anisotropic": False})
    pos = np.ones((10, 3), np.float32)
    out = t({"pos": pos.copy()}, rng())["pos"]
    np.testing.assert_allclose(out, 3.0, atol=1e-6)


def test_chromatic_translation_and_jitter_clip_range():
    for name, kw in (("ChromaticTranslation", {"ratio": 0.05}),
                     ("ChromaticJitter", {"std": 0.01})):
        t = DataTransforms.build({"NAME": name, "p": 1.1, **kw})
        x = rng().integers(0, 256, (300, 3)).astype(np.float32)
        out = t({"x": x.copy()}, rng())["x"]
        assert out.min() >= 0 and out.max() <= 255
        assert not np.allclose(out, x)


def test_random_drop_feature_zeroes_slice():
    t = DataTransforms.build({"NAME": "RandomDropFeature", "feature_drop": 1.1,
                              "drop_dim": [1, 3]})
    x = np.ones((10, 5), np.float32)
    out = t({"x": x.copy()}, rng())["x"]
    assert (out[:, 1:3] == 0).all() and (out[:, 0] == 1).all() \
        and (out[:, 3:] == 1).all()


def test_point_cloud_to_tensor_dtypes():
    t = DataTransforms.build({"NAME": "PointCloudToTensor"})
    data = {"pos": np.zeros((5, 3), np.float64),
            "normals": np.zeros((5, 3), np.float64),
            "colors": np.zeros((5, 3), np.uint8)}
    out = t(data, rng())
    for k in ("pos", "normals", "colors"):
        assert out[k].dtype == np.float32
