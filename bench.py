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

    from dropclip_tpu.sparse.bricks import build_brick_topology
    from dropclip_tpu.sparse.unet import UNET_ARCHS
    from dropclip_tpu.sparse.unet_bricks import MinkUNetBricks

    block, layers, planes = UNET_ARCHS["MinkUNet14D"]
    model = MinkUNetBricks(out_channels=768, block=block, layers=layers,
                           planes=planes)

    # BENCH_SMOKE=1: tiny shapes for a CPU logic check (not a benchmark).
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    b, m = (2, 256) if smoke else (8, 8192)
    rng = np.random.RandomState(0)
    coords_list, mask_list = [], []
    n_occ = 128 if smoke else 6000  # ~MAX_POINTS=10000 pts after voxel dedup
    ext = 8 if smoke else 40        # tabletop ~±40 voxels at 5 cm (SURVEY §6)
    for _ in range(b):
        # surface-like scene: table plane + object shells (matches the
        # brick clustering of real MV-TOD clouds)
        xy = rng.randint(-ext, ext, size=(3 * n_occ, 2))
        z = rng.randint(0, 2, size=(3 * n_occ, 1))
        plane = np.concatenate([xy, z], axis=1)
        blobs = []
        for _ in range(6):
            c = rng.randint(-ext + 6, ext - 6, size=3)
            c[2] = rng.randint(2, 8)
            th = rng.randn(n_occ // 4, 3)
            th /= np.linalg.norm(th, axis=1, keepdims=True)
            blobs.append((c + th * rng.randint(3, 6)).astype(int))
        pts = np.concatenate([plane] + blobs).astype(np.int32)
        uniq = np.unique(pts, axis=0)
        rng.shuffle(uniq)
        uniq = uniq[:n_occ]
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

    topo0 = build_brick_topology(coords, mask)
    variables = jax.jit(
        lambda t, f: model.init(jax.random.PRNGKey(0), t, f, train=False)
    )(topo0, feats)

    # Params as an argument, not a closure constant (compile-time blowup).
    # The jitted step CHAINS several forwards with a data dependency and
    # returns a scalar checksum: fetching it to host is the only reliable
    # sync point (on tunneled TPU runtimes block_until_ready can ack
    # before execution finishes), and chaining amortizes the host-fetch
    # round trip out of the per-forward time.
    reps = 1 if smoke else 5

    @jax.jit
    def forward(variables, coords, mask, feats):
        def body(carry, _):
            f, acc = carry
            topo = build_brick_topology(coords, mask)
            out = model.apply(variables, topo, f, train=False)
            s = jnp.sum(out.astype(jnp.float32))
            # data dependency between reps (prevents CSE/elision)
            return (f + (s * 1e-30).astype(f.dtype), acc + s), None

        (_, acc), _ = jax.lax.scan(body, (feats, jnp.float32(0.0)), None,
                                   length=reps)
        return acc

    # compile + warmup (host fetch forces full execution)
    float(forward(variables, coords, mask, feats))
    float(forward(variables, coords, mask, feats))

    iters = 3 if smoke else 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(forward(variables, coords, mask, feats))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times)) / reps
    scenes_per_sec = b / p50

    print(json.dumps({
        "metric": "single_view_infer_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / EST_BASELINE_SCENES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
