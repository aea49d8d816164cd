"""tools/profile.py e2e on CPU (host-thunk fallback table)."""

import pytest

pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

pytestmark = pytest.mark.slow  # compile + trace (fast gate: -m 'not slow')


def test_profile_cli_fusion_tiny(tmp_path, capsys):
    from dropclip_tpu.tools.profile import main

    rc = main(["--surface", "fusion", "--tiny", "--top", "5",
               "--reps", "2", "--logdir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device total" in out
    assert "stems:" in out
    # the trace landed where asked
    assert str(tmp_path) in out


def test_profile_cli_teacher_tiny(tmp_path, capsys):
    from dropclip_tpu.tools.profile import main

    rc = main(["--surface", "teacher", "--tiny", "--top", "3",
               "--reps", "1", "--logdir", str(tmp_path)])
    assert rc == 0
    assert "device total" in capsys.readouterr().out
