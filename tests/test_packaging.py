"""Packaging surface: pyproject entry points resolve to real callables.

The reference is used as a source checkout only; this rebuild is a
pip-installable framework (``pip install -e .``), so the console-script
targets must stay importable.
"""
import importlib
import pathlib

import pytest

try:
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.skipif(tomllib is None, reason="tomllib requires python>=3.11")
def test_console_scripts_resolve():
    with open(ROOT / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    scripts = meta["project"]["scripts"]
    assert set(scripts) == {"geot-train", "geot-predict", "geot-serve",
                            "geot-export", "geot-convert", "geot-launch"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


@pytest.mark.skipif(tomllib is None, reason="tomllib requires python>=3.11")
def test_native_sources_shipped():
    with open(ROOT / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    pkg_data = meta["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["geot_tpu.native"]
    assert (ROOT / "geot_tpu" / "native" / "grid_subsample.cpp").exists()
