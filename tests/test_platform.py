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
