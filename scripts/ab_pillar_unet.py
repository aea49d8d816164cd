"""Hardware A/B: full MinkUNet14D forward, pillar engine vs brick engine.

The op-level A/B (ab_pillar_conv.py) measured the volumetric inversion
on ONE conv (pallas-pillar 1.22x over xla-brick at equalized fills).
This script measures the whole production-width student — per-scene
single-view inference, the deployment shape — on the same volumetric
scenes:

  A. bricks   : MinkUNetBricks, (4, 4, 2) bricks, fold_batch, the
                production engine.
  B. pillars  : MinkUNetPillars, XLA formulations everywhere.
  C. pillars+ : MinkUNetPillars with the fused Pallas k3 kernel on the
                qualifying levels (Z % 8 == 0, C % 128 == 0).

All arms run the SAME variables (checkpoint-compatible param trees) on
the SAME scenes; outputs are asserted close before timing. Topologies
build host-side per scene at shared padded capacities, so each arm
compiles ONCE and replays per scene — the serve pattern.

Run on TPU: python scripts/ab_pillar_unet.py [--scenes 8] [--occ 6000]
Sync rule: fetch a scalar per forward (tunneled block_until_ready lies).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.data.synthetic import make_volumetric_coords
from dropclip_tpu.sparse.bricks import (autotune_brick_capacities,
                                        build_brick_topology)
from dropclip_tpu.sparse.pillar_topology import build_pillar_topology
from dropclip_tpu.sparse.unet import UNET_ARCHS
from dropclip_tpu.sparse.unet_bricks import MinkUNetBricks
from dropclip_tpu.sparse.unet_pillars import MinkUNetPillars

p = argparse.ArgumentParser()
p.add_argument("--scenes", type=int, default=8)
p.add_argument("--m", type=int, default=8192)
p.add_argument("--occ", type=int, default=6000)
p.add_argument("--zext", type=int, default=32)
p.add_argument("--reps", type=int, default=5)
p.add_argument("--arch", default="MinkUNet14D")
p.add_argument("--out", type=int, default=768)
args = p.parse_args()

rng = np.random.RandomState(0)
coords_np, mask_np = make_volumetric_coords(rng, args.scenes, args.m,
                                            n_occ=args.occ, ext=20,
                                            zext=args.zext)
feats_np = (rng.randn(args.scenes, args.m, 6).astype(np.float32)
            * mask_np[..., None])

block, layers, planes = UNET_ARCHS[args.arch]

# ---- arm A: bricks (production engine) ------------------------------------
bshape = (4, 4, 2)
bcaps = autotune_brick_capacities(coords_np, mask_np, brick_shape=bshape)
net_b = MinkUNetBricks(out_channels=args.out, block=block, layers=layers,
                       planes=planes, fold_batch=True)
c0 = jnp.asarray(coords_np[:1])
k0 = jnp.asarray(mask_np[:1])
f0 = jnp.asarray(feats_np[:1]).astype(jnp.bfloat16)
topo_b0 = build_brick_topology(c0, k0, brick_capacities=bcaps,
                               brick_shape=bshape)
variables = jax.jit(
    lambda t, f: net_b.init(jax.random.PRNGKey(0), t, f, train=False)
)(topo_b0, f0)


@jax.jit
def fwd_bricks(variables, c, k, f):
    topo = build_brick_topology(c, k, brick_capacities=bcaps,
                                brick_shape=bshape)
    out = net_b.apply(variables, topo, f, train=False)
    return out, jnp.sum(out.astype(jnp.float32))


# ---- arms B/C: pillars ----------------------------------------------------
topos = [build_pillar_topology(coords_np[i], mask_np[i])
         for i in range(args.scenes)]
# shared padded capacities: multiples of 16 so every level satisfies the
# Pallas kernel's pillar_tile divisibility (pt in {4, 8, 16} at Z 32/16/8)
caps = [16 * int(np.ceil(max(t.levels[l].occ.shape[0] for t in topos) / 16))
        for l in range(5)]
topos = [build_pillar_topology(coords_np[i], mask_np[i],
                               site_capacities=caps)
         for i in range(args.scenes)]

net_p = MinkUNetPillars(out_channels=args.out, block=block, layers=layers,
                        planes=planes, use_pallas=False)
net_pk = MinkUNetPillars(out_channels=args.out, block=block, layers=layers,
                         planes=planes, use_pallas=True)


@jax.jit
def fwd_pillars(variables, topo, f):
    out = net_p.apply(variables, topo, f, train=False)
    return out, jnp.sum(out.astype(jnp.float32))


@jax.jit
def fwd_pillars_k(variables, topo, f):
    out = net_pk.apply(variables, topo, f, train=False)
    return out, jnp.sum(out.astype(jnp.float32))


def bench(name, fn, calls):
    # compile + parity warmup
    outs = []
    for call in calls[:1]:
        out, s = call(fn)
        float(s)
        outs.append(np.asarray(out, np.float32))
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.reps):
        for call in calls:
            _, s = call(fn)
            float(s)
            n += 1
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:10s} {dt:8.2f} ms/scene", flush=True)
    return outs[0], dt


calls_b = [lambda fn, i=i: fn(variables, jnp.asarray(coords_np[i:i + 1]),
                              jnp.asarray(mask_np[i:i + 1]),
                              jnp.asarray(feats_np[i:i + 1])
                              .astype(jnp.bfloat16))
           for i in range(args.scenes)]
calls_p = [lambda fn, i=i: fn(variables, topos[i],
                              jnp.asarray(feats_np[i]).astype(jnp.bfloat16))
           for i in range(args.scenes)]

n_vox = int(mask_np.sum())
print(f"{args.arch} out={args.out} | {args.scenes} volumetric scenes, "
      f"{n_vox} voxels | brick caps {list(bcaps)} | pillar caps {caps}",
      flush=True)
out_b, t_b = bench("bricks", fwd_bricks, calls_b)
out_p, t_p = bench("pillars", fwd_pillars, calls_p)
out_pk, t_pk = bench("pillars+k", fwd_pillars_k, calls_p)

# parity: same checkpoint, same scene, per-point outputs
a, b, c = out_b[0], out_p, out_pk
den = max(np.abs(a).max(), 1.0)
print(f"pillars vs bricks  max rel err {np.abs(a - b).max() / den:.2e}")
print(f"pallas  vs pillars max rel err {np.abs(b - c).max() / den:.2e}")
print(f"END-TO-END: pillars {t_b / t_p:.2f}x vs bricks; "
      f"pillars+kernel {t_b / t_pk:.2f}x vs bricks", flush=True)
