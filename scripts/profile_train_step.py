"""Profile ONE bricks-engine train step (batch 8 x 8192 voxels,
MinkUNet14D, full recipe incl. BN) — looking for pathological fusion
classes like the teacher's (PERF.md "LayerNorm")."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.core.config import load_cfg
from dropclip_tpu.distill.engine import (DistilBatch, build_topology,
                                         build_student_for, make_train_step)
from dropclip_tpu.distill.train_state import create_train_state, make_optimizer

cfg = load_cfg(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "DistilBlender.yaml"))

b, m = 8, 8192
rng = np.random.RandomState(0)
coords_list, mask_list = [], []
n_occ, ext = 6000, 40
for _ in range(b):
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
fd = int(cfg.feat_dim or 768)
batch = DistilBatch(
    coords=coords, mask=mask,
    in_feats=jnp.asarray(rng.randn(b, m, 6).astype(np.float32)) * mask[..., None],
    targets=jnp.asarray(rng.randn(b, m, fd).astype(np.float32)) * mask[..., None],
    labels=jnp.asarray(rng.randint(0, 12, size=(b, m)).astype(np.int32)),
    labels_cls=jnp.asarray(rng.randint(0, 44, size=(b, m)).astype(np.int32)))

# the trainer's one-time capacity autotune (without it the heuristic
# over-allocates, XLA rematerializes under HBM pressure, and the profile
# measures the remat tax instead of the production step — bench.py
# main_train applies the same)
from dropclip_tpu.sparse.bricks import autotune_brick_capacities

cfg.brick_capacities = list(autotune_brick_capacities(
    np.asarray(coords), np.asarray(mask), slack=1.5,
    brick_shape=tuple(cfg.brick_shape or (4, 4, 2))))

model = build_student_for(cfg)
topo = build_topology(cfg, batch.coords, batch.mask)
tx = make_optimizer(cfg, 100)
state = create_train_state(model, topo, batch.in_feats, tx)
step = jax.jit(make_train_step(cfg))
key = jax.random.PRNGKey(0)

state, metrics = step(state, batch, key)
print("warm loss:", float(metrics["total_loss"]), flush=True)
t0 = time.perf_counter()
REPS = 5
for _ in range(REPS):
    state, metrics = step(state, batch, key)
    _ = float(metrics["total_loss"])
dt = (time.perf_counter() - t0) / REPS
print(f"train step: {dt*1e3:.1f} ms/batch-of-8 = {8/dt:.1f} scenes/sec",
      flush=True)

logdir = "/tmp/prof_train2"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    state, metrics = step(state, batch, key)
    _ = float(metrics["total_loss"])

from dropclip_tpu.core.xplane import print_profile

print_profile(logdir, top=20)
