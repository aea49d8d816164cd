"""xplane profile parser over a synthetic proto (no TPU needed)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from dropclip_tpu.core.xplane import op_totals, stem_totals


@pytest.fixture()
def trace_dir(tmp_path):
    xs = tf.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "%fusion.1 = f32[8]{0} fusion(...)"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "%fusion.2 = f32[8]{0} fusion(...)"
    plane.event_metadata[3].id = 3
    plane.event_metadata[3].name = "%copy.7 = bf16[4]{0} copy(...)"
    line = plane.lines.add()
    line.name = "XLA Ops"
    for mid, ps in ((1, 2_000_000), (2, 3_000_000), (1, 1_000_000),
                    (3, 500_000)):
        ev = line.events.add()
        ev.metadata_id = mid
        ev.duration_ps = ps
    # a non-op line and a non-TPU plane must be ignored
    other = plane.lines.add()
    other.name = "XLA Modules"
    ev = other.events.add()
    ev.metadata_id = 1
    ev.duration_ps = 10**9
    host = xs.planes.add()
    host.name = "/host:CPU"
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(xs.SerializeToString())
    return str(tmp_path)


def test_op_totals(trace_dir):
    totals = op_totals(trace_dir)
    assert len(totals) == 3
    np.testing.assert_allclose(
        totals["%fusion.1 = f32[8]{0} fusion(...)"], 3e-6)
    np.testing.assert_allclose(sum(totals.values()), 6.5e-6)


def test_stem_totals(trace_dir):
    stems = stem_totals(op_totals(trace_dir))
    np.testing.assert_allclose(stems["%fusion"], 6e-6)
    np.testing.assert_allclose(stems["%copy"], 0.5e-6)


def test_missing_trace(tmp_path):
    with pytest.raises(FileNotFoundError):
        op_totals(str(tmp_path))


@pytest.fixture()
def cpu_trace_dir(tmp_path):
    """XLA:CPU-shaped trace: no device plane, thunk events on the
    tf_XLAPjRtCpuClient host line (real durations + 'end:' markers)."""
    xs = tf.XSpace()
    host = xs.planes.add()
    host.name = "/host:CPU"
    for i, name in enumerate(
            ["fusion.9", "end: fusion.9", "dot_general.1",
             "ThreadpoolListener::StartRegion",
             "ThunkExecutor::Execute (wait for completion)"], start=1):
        host.event_metadata[i].id = i
        host.event_metadata[i].name = name
    line = host.lines.add()
    line.name = "tf_XLAPjRtCpuClient/123"
    for mid, ps in ((1, 2_000_000), (2, 1_000), (3, 5_000_000),
                    (4, 9_000_000), (5, 9_000_000)):
        ev = line.events.add()
        ev.metadata_id = mid
        ev.duration_ps = ps
    other = host.lines.add()  # non-client host line must be ignored
    other.name = "python"
    ev = other.events.add()
    ev.metadata_id = 1
    ev.duration_ps = 10**9
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(xs.SerializeToString())
    return str(tmp_path)


def test_cpu_thunk_fallback(cpu_trace_dir):
    totals = op_totals(cpu_trace_dir)  # no device plane -> host thunks
    assert set(totals) == {"fusion.9", "dot_general.1"}
    np.testing.assert_allclose(totals["fusion.9"], 2e-6)
    np.testing.assert_allclose(totals["dot_general.1"], 5e-6)
    stems = stem_totals(totals)
    assert set(stems) == {"fusion", "dot_general"}


def test_device_plane_beats_host_fallback(trace_dir):
    # auto-detect must pick the TPU plane when one exists
    totals = op_totals(trace_dir, device=None)
    assert len(totals) == 3
