"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated here without TPU hardware, per the
framework's test strategy (SURVEY.md §4): set the XLA host-platform device
count before JAX initializes.
"""

import os

# Force CPU even when the shell env points JAX at a TPU tunnel (the machine
# may pre-register a hardware platform plugin and set JAX_PLATFORMS to it);
# tests must be hermetic and fast.  XLA_FLAGS must land before the CPU client
# is created; jax.config wins over the env var for platform selection.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
