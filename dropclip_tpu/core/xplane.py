"""Op-level profile parsing straight from the xplane protobuf.

``jax.profiler.trace`` writes an ``*.xplane.pb`` per host; the
tensorboard profile plugin in this image is version-broken, so the
roofline studies in PERF.md parse the proto directly (the xplane proto
ships inside tensorflow as ``tensorflow.tsl.profiler.protobuf``).

Typical use::

    with jax.profiler.trace(logdir):
        float(jnp.sum(step(...)))          # sync INSIDE the trace
    totals = op_totals(logdir)             # {hlo_op_name: seconds}
    for stem, s in sorted(stem_totals(totals).items(), key=...):
        ...

``tools/profile.py`` wraps this as a CLI over the framework's hot
surfaces (train step / inference / teacher / fusion).
"""

from __future__ import annotations

import glob
import re
from typing import Dict, Optional

_DEVICE_PLANE_RE = re.compile(r"/device:(TPU|GPU):\d+$")

# XLA:CPU thunk-line bookkeeping events (not ops)
_CPU_NOISE = ("ThreadpoolListener::", "ThunkExecutor::Execute")


def _load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _host_thunk_totals(xs) -> Dict[str, float]:
    """XLA:CPU fallback: per-thunk host seconds.

    CPU traces carry no device plane; the ``tf_XLAPjRtCpuClient*`` thread
    lines on ``/host:CPU`` record each executed thunk with a REAL duration
    (plus a cheap ``end: <thunk>`` marker and threadpool bookkeeping,
    skipped here). Summed across client threads — a host-time
    approximation, good for relative op ranking on CPU runs."""
    totals: Dict[str, float] = {}
    for plane in xs.planes:
        if not plane.name.startswith("/host:CPU"):
            continue
        meta = plane.event_metadata
        for ln in plane.lines:
            if not ln.name.startswith("tf_XLAPjRtCpuClient"):
                continue
            for ev in ln.events:
                name = meta[ev.metadata_id].name
                if name.startswith("end: ") or name.startswith(_CPU_NOISE):
                    continue
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e12
    return totals


def op_totals(logdir: str, device: Optional[str] = None,
              line: str = "XLA Ops") -> Dict[str, float]:
    """Summed on-device seconds per HLO op name from the newest trace.

    Device-op durations come from the hardware trace, so they are valid
    even when host wall-clock is polluted (CPU contention, tunnel).
    ``device=None`` auto-picks the first TPU/GPU plane that carries an
    ``XLA Ops`` line; with no device plane at all (XLA:CPU run) it falls
    back to host thunk durations (`_host_thunk_totals`)."""
    xs = _load_xspace(logdir)
    if device is None:
        for plane in xs.planes:
            if (_DEVICE_PLANE_RE.match(plane.name)
                    and any(ln.name == line for ln in plane.lines)):
                device = plane.name
                break
        else:
            return _host_thunk_totals(xs)
    totals: Dict[str, float] = {}
    for plane in xs.planes:
        if plane.name != device:
            continue
        meta = plane.event_metadata
        for ln in plane.lines:
            if ln.name != line:
                continue
            for ev in ln.events:
                name = meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e12
    return totals


def stem_totals(totals: Dict[str, float]) -> Dict[str, float]:
    """Collapse ``%fusion.123 = ...`` instances to their op stem."""
    stems: Dict[str, float] = {}
    for name, s in totals.items():
        stem = re.sub(r"[.\d]*\s*=.*", "", name).strip()
        stem = re.sub(r"\.\d+$", "", stem)  # CPU thunk names: 'fusion.9'
        stems[stem] = stems.get(stem, 0.0) + s
    return stems


def print_profile(logdir: str, top: int = 25,
                  device: Optional[str] = None) -> None:
    totals = op_totals(logdir, device=device)
    tot = sum(totals.values())
    print(f"device total {tot * 1e3:.2f} ms over {len(totals)} ops")
    for name, s in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {s * 1e3:8.2f} ms  {100 * s / max(tot, 1e-12):5.1f}%  "
              f"{name[:100]}")
    print("\nstems:")
    for stem, s in sorted(stem_totals(totals).items(),
                          key=lambda kv: -kv[1])[:top]:
        print(f"  {s * 1e3:8.2f} ms  {100 * s / max(tot, 1e-12):5.1f}%  "
              f"{stem[:90]}")
