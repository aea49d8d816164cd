"""Platform selection helper.

The axon TPU plugin force-registers itself and IGNORES the
``JAX_PLATFORMS`` environment variable; only the config knob wins. Call
this before first device use from any entry point that should honor the
env var (bench.py, __graft_entry__.py; tests/conftest.py inlines the
same logic because it must run before the package is importable).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
