"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests follow the standard recipe of simulating
chips with XLA host devices (SURVEY.md §4): set the platform before
jax is imported anywhere.
"""

import os

# Force CPU: the session environment may preset JAX_PLATFORMS to a TPU
# backend; tests must be deterministic and run the virtual 8-device mesh.
# pytest plugins import jax before this conftest runs, so set both the env
# (for subprocesses) and the live config (backend initializes lazily).
# PNR_TPU_TEST_ON_TPU=1 opts OUT of the CPU forcing so the TPU-only
# Mosaic tests (skipped on the CPU mesh) can run against real hardware:
#   PNR_TPU_TEST_ON_TPU=1 python -m pytest tests/test_ops_dense.py::TestPallasConv
if not os.environ.get("PNR_TPU_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def cpu_numerics_marker():
    """Shared skipif for interpret-mode kernel tests: their tolerances
    assert CPU f32 dot numerics; on a TPU backend (PNR_TPU_TEST_ON_TPU=1)
    interpret mode lowers to XLA default-precision dots (~3e-4 shifts)
    that are platform numerics, not kernel bugs."""
    import jax.numpy as jnp

    return pytest.mark.skipif(
        jnp.zeros(1).devices().pop().platform != "cpu",
        reason="interpret-mode tolerance assumes CPU f32 dot numerics",
    )
