"""Test config.

Run the suite through ``scripts/test.sh``: it exports the pure-CPU env
(``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``)
BEFORE the interpreter starts.  Setting those here is too late — the axon TPU
plugin registers in sitecustomize.py at startup, so a bare ``pytest`` run
executes on the (single-tenant, remote-compiled) TPU.  The env mutation below
is kept as a best-effort fallback for subprocesses the tests may spawn.
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This XLA CPU build defaults to low-precision f32 matmuls (bf16-level error,
# ~0.07 on a 64x64 product); pin full f32 so numeric oracles are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def cpu_devices(n: int = 8):
    import jax

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]
