"""Hardware A/B: sparse conv3 engines at the production hot shape.

Arms, all computing mask(relu(conv3(x) * scale + bias)) over the same
logical workload — 262144 voxels at ~45% occupancy, C=Cout=384 (the
full-resolution decoder stage of the (4, 4, 2) brick MinkUNet, batch
folded in):

  A. xla-brick   : sparse/bricks.brick_conv + XLA epilogue on 8192
                   (4, 4, 2) bricks — the current production path.
  B. xla-pillar  : pillar_conv3_xla on 8192 (Z=32) pillars — gather ->
                   3 shifted einsums, same layout as C.
  C. pallas-pillar: pallas_pillar_conv3 — fused DMA/shift/matmul/epilogue.

B and C share inputs, so their outputs are asserted equal. A computes
the same operator on a different (brick) topology — its number is the
throughput baseline, not a bitwise comparison.

Run on TPU: python scripts/ab_pillar_conv.py [--voxels 262144] [--c 384]
Sync rule: fetch a scalar per rep (tunneled block_until_ready lies).

--realistic replaces the matched-padding synthetic with a
make_tabletop_coords batch (the bench infer workload): each engine gets
its own native padded shape for the SAME voxel set, so the comparison
includes the pillar layout tax (z-thin tabletop scenes fill ~9% of
pillar slots vs ~35% of (4, 4, 2) brick slots — measured in-script).
That is the end-to-end engine verdict; the default matched-padding run
is the kernel-efficiency verdict.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.sparse.bricks import BrickLevel, brick_conv

INTERPRET = jax.default_backend() != "tpu"  # CPU smoke runs only
from dropclip_tpu.sparse.pallas_pillar import (PILLAR_DIRS,
                                               pallas_pillar_conv3,
                                               pillar_conv3_xla)

p = argparse.ArgumentParser()
p.add_argument("--voxels", type=int, default=262144)
p.add_argument("--c", type=int, default=384)
p.add_argument("--cout", type=int, default=384)
p.add_argument("--z", type=int, default=32, help="pillar height")
p.add_argument("--occupancy", type=float, default=0.45)
p.add_argument("--reps", type=int, default=20)
p.add_argument("--realistic", action="store_true",
               help="tabletop-occupancy batch, native padding per engine")
p.add_argument("--workload", choices=("tabletop", "volumetric"),
               default="tabletop",
               help="--realistic scene statistics: z-thin tabletop (the "
                    "bench infer workload; pillars pay the padding tax) "
                    "or volumetric bin/shelf scenes (deep z columns — "
                    "the regime the pillar layout is FOR)")
args = p.parse_args()
c, cout = args.c, args.cout
rng = np.random.RandomState(0)

w_np = rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.05
scale = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)


def bench(name, fn, x, flops):
    out = fn(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(x)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"{name:14s} {dt:8.2f} ms   {flops / dt / 1e9:7.1f} TF/s",
          flush=True)
    return out, dt


# ---- realistic mode: tabletop batch, native padding per engine ------------
if args.realistic:
    from dropclip_tpu.data.synthetic import (make_tabletop_coords,
                                             make_volumetric_coords)
    from dropclip_tpu.sparse.bricks import (autotune_brick_capacities,
                                            build_brick_topology)

    B, M = 8, 8192
    srng = np.random.RandomState(0)
    if args.workload == "volumetric":
        coords_np, mask_np = make_volumetric_coords(srng, B, M, n_occ=6000,
                                                    ext=20, zext=args.z)
    else:
        coords_np, mask_np = make_tabletop_coords(srng, B, M, n_occ=6000,
                                                  ext=40)

    # brick arm: per-scene topologies folded into one brick axis
    bshape = (4, 4, 2)
    bv = int(np.prod(bshape))
    caps = autotune_brick_capacities(coords_np, mask_np, brick_shape=bshape)
    cap = caps[0]
    nbrs, occs = [], []
    for b in range(B):
        topo = build_brick_topology(jnp.asarray(coords_np[b]),
                                    jnp.asarray(mask_np[b]),
                                    brick_capacities=caps,
                                    brick_shape=bshape)
        lvl = topo.levels[0]
        nb = np.asarray(lvl.nbr)
        nb = np.where(nb >= cap, B * cap, nb + b * cap)
        nbrs.append(nb)
        occs.append(np.asarray(lvl.occ))
    bm = B * cap
    occ_b = jnp.asarray(np.concatenate(occs))
    feats_b = (jnp.asarray(srng.randn(bm, *bshape, c).astype(np.float32))
               .astype(jnp.bfloat16) * occ_b[..., None])
    level = BrickLevel(coords=jnp.zeros((bm, 3), jnp.int32),
                       keys=jnp.zeros((bm,), jnp.int32),
                       mask=jnp.ones((bm,), bool), occ=occ_b,
                       nbr=jnp.asarray(np.concatenate(nbrs)))
    w27 = jnp.asarray(w_np.reshape(27, c, cout)).astype(jnp.bfloat16)

    @jax.jit
    def xla_brick(x):
        y = brick_conv(x, level, w27, 3).astype(jnp.float32)
        y = jax.nn.relu(y * scale + bias)
        return (y * occ_b[..., None]).astype(x.dtype)

    # pillar arm: per-scene (x, y) tables folded into one pillar axis
    from dropclip_tpu.sparse.pallas_pillar import pillar_tile
    zmin = min(coords_np[b][mask_np[b]][:, 2].min() for b in range(B))
    zmax = max(coords_np[b][mask_np[b]][:, 2].max() for b in range(B))
    z = max(8, int(np.ceil((zmax - zmin + 1) / 8) * 8))
    pt = pillar_tile(z)
    pcaps = []
    scene_tabs = []
    for b in range(B):
        csc = coords_np[b][mask_np[b]]
        xy, inv = np.unique(csc[:, :2], axis=0, return_inverse=True)
        pcaps.append(len(xy))
        scene_tabs.append((csc, xy, inv))
    p_cap = int(np.ceil(max(pcaps) / pt) * pt)
    n_pil = B * p_cap
    nbr_p = np.full((B, p_cap, 9), n_pil, np.int32)
    occ_p = np.zeros((B, p_cap, z), bool)
    for b, (csc, xy, inv) in enumerate(scene_tabs):
        lut = {tuple(q): i for i, q in enumerate(xy)}
        occ_p[b][inv, csc[:, 2] - zmin] = True
        for j, (dx, dy) in enumerate(PILLAR_DIRS):
            for i, q in enumerate(xy):
                r = lut.get((q[0] + dx, q[1] + dy))
                if r is not None:
                    nbr_p[b, i, j] = b * p_cap + r
    nbr_p = jnp.asarray(nbr_p.reshape(n_pil, 9))
    occ_pj = jnp.asarray(occ_p.reshape(n_pil, z))
    feats_p = (jnp.asarray(srng.randn(n_pil, z, c).astype(np.float32))
               .astype(jnp.bfloat16) * occ_pj[..., None])
    w9_np = np.zeros((9, 3, c, cout), np.float32)
    for j, (dx, dy) in enumerate(PILLAR_DIRS):
        w9_np[j] = w_np[dx + 1, dy + 1]
    w9 = jnp.asarray(w9_np).astype(jnp.bfloat16)

    @jax.jit
    def xla_pillar(x):
        return pillar_conv3_xla(x, nbr_p, w9, occ_pj, scale, bias, relu=True)

    @jax.jit
    def pallas_pillar(x):
        return pallas_pillar_conv3(x, nbr_p, w9, occ_pj, scale, bias,
                                   relu=True, interpret=INTERPRET)

    n_vox = int(mask_np.sum())
    print(f"realistic[{args.workload}]: {B} scenes, {n_vox} voxels | "
          f"bricks {bm} x {bshape} "
          f"(slots {bm * bv}, fill {n_vox / (bm * bv):.2f}) | pillars "
          f"{n_pil} x Z={z} (slots {n_pil * z}, "
          f"fill {n_vox / (n_pil * z):.2f})", flush=True)
    fl_b = 2 * bm * bv * 27 * c * cout
    fl_p = 2 * n_pil * z * 27 * c * cout
    _, t_a = bench("xla-brick", xla_brick, feats_b, fl_b)
    ref, t_b = bench("xla-pillar", xla_pillar, feats_p, fl_p)
    got, t_c = bench("pallas-pillar", pallas_pillar, feats_p, fl_p)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    den = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    print(f"pallas vs xla-pillar: max abs err {err:.4f} "
          f"(rel {err / den:.2e})")
    print(f"END-TO-END same voxel set: pallas-pillar vs xla-brick "
          f"{t_a / t_c:.2f}x", flush=True)
    sys.exit(0)


# ---- arm A: XLA brick path ------------------------------------------------
bshape = (4, 4, 2)
bv = int(np.prod(bshape))
bm = args.voxels // bv
nbr_np = np.clip(np.arange(bm)[:, None]
                 + rng.randint(-64, 64, size=(bm, 27)), 0, bm - 1)
nbr_np = nbr_np.astype(np.int32)
nbr_np[rng.rand(bm, 27) < 0.25] = bm
nbr_np[:, 13] = np.arange(bm)
occ_b = jnp.asarray(rng.rand(bm, *bshape) < args.occupancy)
feats_b = (jnp.asarray(rng.randn(bm, *bshape, c).astype(np.float32))
           .astype(jnp.bfloat16) * occ_b[..., None])
w27 = jnp.asarray(w_np.reshape(27, c, cout)).astype(jnp.bfloat16)
level = BrickLevel(coords=jnp.zeros((bm, 3), jnp.int32),
                   keys=jnp.zeros((bm,), jnp.int32),
                   mask=jnp.ones((bm,), bool), occ=occ_b,
                   nbr=jnp.asarray(nbr_np))


@jax.jit
def xla_brick(x):
    y = brick_conv(x, level, w27, 3).astype(jnp.float32)
    y = jax.nn.relu(y * scale + bias)
    return (y * occ_b[..., None]).astype(x.dtype)


# ---- arms B/C: pillar layout ----------------------------------------------
z = args.z
n_pillars = args.voxels // z
gx = int(np.sqrt(n_pillars))
while n_pillars % gx:
    gx -= 1
gy = n_pillars // gx
nbr9 = np.full((gx, gy, 9), n_pillars, np.int32)
for j, (dx, dy) in enumerate(PILLAR_DIRS):
    xs, ys = np.arange(gx) + dx, np.arange(gy) + dy
    valid = ((xs[:, None] >= 0) & (xs[:, None] < gx) &
             (ys[None, :] >= 0) & (ys[None, :] < gy))
    idx = np.clip(xs[:, None], 0, gx - 1) * gy + np.clip(ys[None, :], 0,
                                                         gy - 1)
    nbr9[:, :, j] = np.where(valid, idx, n_pillars)
nbr9 = jnp.asarray(nbr9.reshape(n_pillars, 9))
occ_p = jnp.asarray(rng.rand(n_pillars, z) < args.occupancy)
feats_p = (jnp.asarray(rng.randn(n_pillars, z, c).astype(np.float32))
           .astype(jnp.bfloat16) * occ_p[..., None])
w9_np = np.zeros((9, 3, c, cout), np.float32)
for j, (dx, dy) in enumerate(PILLAR_DIRS):
    w9_np[j] = w_np[dx + 1, dy + 1]
w9 = jnp.asarray(w9_np).astype(jnp.bfloat16)


@jax.jit
def xla_pillar(x):
    return pillar_conv3_xla(x, nbr9, w9, occ_p, scale, bias, relu=True)


@jax.jit
def pallas_pillar(x):
    return pallas_pillar_conv3(x, nbr9, w9, occ_p, scale, bias, relu=True,
                               interpret=INTERPRET)


flops = 2 * args.voxels * 27 * c * cout
print(f"voxels={args.voxels} C={c} Cout={cout} | bricks: {bm} x {bshape} | "
      f"pillars: {n_pillars} ({gx}x{gy}) x Z={z}", flush=True)
_, t_a = bench("xla-brick", xla_brick, feats_b, flops)
ref, t_b = bench("xla-pillar", xla_pillar, feats_p, flops)
got, t_c = bench("pallas-pillar", pallas_pillar, feats_p, flops)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
den = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
print(f"pallas vs xla-pillar: max abs err {err:.4f} (rel {err / den:.2e})")
print(f"speedup vs xla-brick {t_a / t_c:.2f}x, vs xla-pillar {t_b / t_c:.2f}x",
      flush=True)
