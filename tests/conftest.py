"""Test config.

Requests an 8-virtual-device CPU platform so sharding tests can exercise a
multi-chip mesh without TPU hardware (SURVEY.md §4 item 4).  Note: under the
axon TPU tunnel the default platform stays TPU regardless of JAX_PLATFORMS —
compute tests then run on the real chip (good), and mesh tests explicitly pick
``jax.devices('cpu')``.
"""
import os

# Run the test suite on pure CPU, bypassing the axon TPU plugin entirely:
# the TPU is single-tenant behind a relay, and a killed test process leaves a
# stale claim that wedges the chip for ~2 minutes.  TPU validation is driven
# deliberately (bench.py / scripts), not from pytest.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
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
