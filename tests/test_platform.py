"""core.platform helpers (no backend init)."""
import dropclip_tpu.core.platform as platform


def test_env_flag_off_values(monkeypatch):
    # "0"/"false"/"no"/"off"/empty/unset must all read as OFF — a plain
    # bool(os.environ.get(...)) treats "0" as ON, which silently turned
    # both arms of the DROPCLIP_PACKED_ATTN A/B into the treatment arm.
    for v in ("0", "false", "FALSE", "no", "off", "", "  "):
        monkeypatch.setenv("DROPCLIP_TEST_FLAG", v)
        assert platform.env_flag("DROPCLIP_TEST_FLAG") is False, v
    monkeypatch.delenv("DROPCLIP_TEST_FLAG", raising=False)
    assert platform.env_flag("DROPCLIP_TEST_FLAG") is False


def test_env_flag_on_values(monkeypatch):
    for v in ("1", "true", "True", "yes", "on", "anything"):
        monkeypatch.setenv("DROPCLIP_TEST_FLAG", v)
        assert platform.env_flag("DROPCLIP_TEST_FLAG") is True, v


def test_env_flag_default(monkeypatch):
    # default-on flags (DROPCLIP_PACKED_ATTN): unset/empty fall back to
    # the default, explicit off-values still win
    monkeypatch.delenv("DROPCLIP_TEST_FLAG", raising=False)
    assert platform.env_flag("DROPCLIP_TEST_FLAG", default=True) is True
    monkeypatch.setenv("DROPCLIP_TEST_FLAG", "")
    assert platform.env_flag("DROPCLIP_TEST_FLAG", default=True) is True
    for v in ("0", "false", "off", "no"):
        monkeypatch.setenv("DROPCLIP_TEST_FLAG", v)
        assert platform.env_flag("DROPCLIP_TEST_FLAG", default=True) is False
    monkeypatch.setenv("DROPCLIP_TEST_FLAG", "1")
    assert platform.env_flag("DROPCLIP_TEST_FLAG", default=True) is True


def test_compile_cache_gating(monkeypatch):
    # default: TPU-only — a cpu-pinned process must NOT get a cache dir
    # (XLA:CPU AOT reload risks SIGILL); explicit path opts in anywhere
    import dropclip_tpu.core.platform as platform

    calls = {}

    class _Cfg:
        def update(self, k, v):
            calls[k] = v

    monkeypatch.setattr(platform, "os", platform.os)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("DROPCLIP_COMPILE_CACHE", raising=False)
    import jax

    monkeypatch.setattr(jax, "config", _Cfg())
    platform.enable_compile_cache()
    assert "jax_compilation_cache_dir" not in calls

    monkeypatch.setenv("DROPCLIP_COMPILE_CACHE", "/tmp/x_cache")
    platform.enable_compile_cache()
    assert calls["jax_compilation_cache_dir"] == "/tmp/x_cache"

    calls.clear()
    monkeypatch.setenv("DROPCLIP_COMPILE_CACHE", "0")
    platform.enable_compile_cache()
    assert "jax_compilation_cache_dir" not in calls

    calls.clear()
    monkeypatch.setenv("DROPCLIP_COMPILE_CACHE", "1")  # enable, NOT a path
    platform.enable_compile_cache()
    assert calls["jax_compilation_cache_dir"].endswith(".jax_cache")

    calls.clear()
    monkeypatch.delenv("DROPCLIP_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    platform.enable_compile_cache()  # assumed-TPU process: cache on
    assert calls["jax_compilation_cache_dir"].endswith(".jax_cache")
