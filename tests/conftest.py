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

# Opt-in persistent compile cache for local iteration: the fast gate is
# compile-bound (~2/3 of its wall clock is XLA:CPU compiles), so
# DROPCLIP_COMPILE_CACHE=<dir> makes warm re-runs much faster. Off by
# default: reloaded XLA:CPU AOT code warns about target-feature mismatch
# (possible SIGILL) — fine for a dev loop, not for correctness artifacts.
if os.environ.get("DROPCLIP_COMPILE_CACHE", "").strip().lower() not in (
        "", "0", "false", "no", "off"):
    from dropclip_tpu.core.platform import enable_compile_cache

    enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
