"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (this stage of the build): single-view student inference
throughput — voxel-topology build + MinkUNet14D sparse UNet forward to
768-d per-point CLIP features — at deployment shapes (batch 8, 8192-voxel
capacity per scene, bf16 activations), end-to-end jitted on one chip.
This is the reference's deployable path (tools/validate_blender.py stack,
SURVEY §3.3), whose hot kernels are MinkowskiEngine CUDA sparse convs.

``vs_baseline`` compares against an estimated reference throughput of
40 scenes/sec (MinkUNet14D on ~8k voxels, batch 8, single modern GPU with
MinkowskiEngine — the reference publishes no numbers; BASELINE.md). Update
when a measured baseline lands.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

EST_BASELINE_SCENES_PER_SEC = 40.0


def main():
    import jax
    import jax.numpy as jnp

    from dropclip_tpu.sparse.topology import build_unet_topology
    from dropclip_tpu.sparse.unet import MinkUNet, UNET_ARCHS

    block, layers, planes = UNET_ARCHS["MinkUNet14D"]
    model = MinkUNet(out_channels=768, block=block, layers=layers, planes=planes)

    # BENCH_SMOKE=1: tiny shapes for a CPU logic check (not a benchmark).
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    b, m = (2, 256) if smoke else (8, 8192)
    rng = np.random.RandomState(0)
    coords_list, mask_list = [], []
    n_occ = 128 if smoke else 6000  # ~MAX_POINTS=10000 pts after voxel dedup
    for _ in range(b):
        pts = rng.randint(-40, 40, size=(3 * n_occ, 3)).astype(np.int32)
        uniq = np.unique(pts, axis=0)[:n_occ]
        coords = np.zeros((m, 3), np.int32)
        coords[: len(uniq)] = uniq
        mask = np.zeros((m,), bool)
        mask[: len(uniq)] = True
        coords_list.append(coords)
        mask_list.append(mask)
    coords = jnp.asarray(np.stack(coords_list))
    mask = jnp.asarray(np.stack(mask_list))
    feats = (jnp.asarray(rng.randn(b, m, 6).astype(np.float32))
             * mask[..., None]).astype(jnp.bfloat16)

    topo0 = build_unet_topology(coords, mask)
    variables = jax.jit(
        lambda t, f: model.init(jax.random.PRNGKey(0), t, f, train=False)
    )(topo0, feats)

    # Params as an argument, not a closure constant (compile-time blowup).
    # The jitted step returns a scalar checksum alongside the features:
    # fetching it to host is the only reliable sync point (on tunneled TPU
    # runtimes block_until_ready can ack before execution finishes).
    @jax.jit
    def forward(variables, coords, mask, feats):
        topo = build_unet_topology(coords, mask)
        out = model.apply(variables, topo, feats, train=False)
        return jnp.sum(out.astype(jnp.float32))

    # compile + warmup (host fetch forces full execution)
    float(forward(variables, coords, mask, feats))
    float(forward(variables, coords, mask, feats))

    iters = 3 if smoke else 20
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(forward(variables, coords, mask, feats))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    scenes_per_sec = b / p50

    print(json.dumps({
        "metric": "single_view_infer_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / EST_BASELINE_SCENES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
