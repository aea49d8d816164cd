"""Test configuration: force CPU with 8 virtual devices so device-mesh /
collective code paths are exercised without TPU hardware (the TPU analogue
of 'multi-node without a cluster' — SURVEY §4)."""

import os

# Force CPU even when the session env pins a TPU platform: unit tests must be
# runnable anywhere, and the virtual 8-device mesh only exists on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
