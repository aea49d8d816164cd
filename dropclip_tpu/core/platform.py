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
    # every entry point routes through here — piggyback the persistent
    # compile cache (no-op if DROPCLIP_COMPILE_CACHE=0)
    enable_compile_cache()


def force_cpu_devices(n: int) -> None:
    """Force the CPU platform with at least ``n`` virtual devices.

    For virtual-mesh correctness checks (``dryrun_multichip``): those must
    never touch the TPU — the check is CPU-virtual by definition, real
    multi-chip hardware is not reachable from here, and merely probing the
    tunneled TPU can fail outright (e.g. a libtpu client/terminal version
    skew aborts at the first ``device_put``). Safe to call even after
    another backend was initialized in-process: backends are cleared and
    re-created on CPU.
    """
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m is None:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    elif int(m.group(1)) < n:
        # a pre-set smaller count must not cap the requested mesh
        os.environ["XLA_FLAGS"] = (
            flags[:m.start()]
            + f"--xla_force_host_platform_device_count={n}"
            + flags[m.end():])

    import jax

    jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("DROPCLIP_COMPILE_CACHE", "").strip():
        # cache may have been enabled for an assumed-TPU process at import
        # (see enable_compile_cache: CPU AOT reload risks SIGILL) — a
        # forced-CPU dryrun turns it back off unless explicitly opted in
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
    try:
        # config knob beats XLA_FLAGS parse-timing issues where available
        if jax.config.jax_num_cpu_devices < n:
            jax.config.update("jax_num_cpu_devices", n)
    except (AttributeError, RuntimeError):
        pass
    needs_reset = False
    try:
        needs_reset = (jax.default_backend() != "cpu"
                       or jax.device_count() < n)
    except Exception:
        needs_reset = True
    if needs_reset:
        jax.clear_caches()
        from jax.extend.backend import clear_backends

        clear_backends()
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() >= n, (jax.device_count(), n)


def enable_compile_cache(path: str = None) -> None:
    """Persistent, content-addressed XLA compilation cache.

    Repeat runs of the CLIs/bench pay the full compile every time (20-40 s
    per TPU program); ``jax_compilation_cache_dir`` amortizes that across
    processes and rounds. Default location: ``<repo>/.jax_cache``
    (gitignored). Disable with ``DROPCLIP_COMPILE_CACHE=0``; override with
    a path.

    TPU-only unless opted in explicitly: XLA:CPU caches AOT machine code
    and reloading it warns about target-feature mismatches ("could lead
    to SIGILL") — measured 3x faster on the warm 8-device dryrun
    (4m35 -> 1m31), but not worth a crash class in a correctness
    artifact. "TPU" is decided WITHOUT initializing a backend: the env
    var must not pin cpu AND libtpu must be importable (a CPU-only box
    with JAX_PLATFORMS unset would otherwise cache CPU AOT code). Set
    ``DROPCLIP_COMPILE_CACHE=<dir>`` (or ``=1`` for the default dir) to
    opt a CPU run in."""
    env = os.environ.get("DROPCLIP_COMPILE_CACHE", "").strip()
    if env.lower() in ("0", "false", "no", "off"):
        return
    if env.lower() in ("1", "true", "yes", "on"):
        env, explicit_opt_in = "", True  # enable w/ default dir anywhere
    else:
        explicit_opt_in = bool(path or env)
    explicit = path or (env if env else None)
    if not explicit_opt_in:
        import importlib.util

        if os.environ.get("JAX_PLATFORMS", "").strip().lower() \
                .startswith("cpu"):
            return
        if importlib.util.find_spec("libtpu") is None:
            return  # no TPU runtime on this machine -> would cache CPU
    p = explicit or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(p))
        # cache everything that takes meaningful time; truly tiny
        # programs are cheaper to recompile than to hash+serialize (the
        # test suite's wall clock is a long tail of ~0.5 s compiles, so
        # the bar sits below them)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the knobs: cache is an optimization only


def env_flag(name: str, default: bool = False) -> bool:
    """Boolean env-var flag. ``VAR=0`` / ``false`` / ``no`` / ``off`` are
    OFF, unset falls back to ``default`` — ``bool(os.environ.get(...))``
    would treat "0" as ON, which silently inverts A/B control arms."""
    raw = os.environ.get(name, "").strip().lower()
    if not raw:
        return default
    return raw not in ("0", "false", "no", "off")
