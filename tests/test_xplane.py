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
