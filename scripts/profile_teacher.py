"""Profile ONE teacher obj-prior dispatch — op-level TPU breakdown.

Usage: python scripts/profile_teacher.py        (needs the TPU; ~3 min
compile first run). Prints the chunk wall time, the implied s/scene for
the 73-view ingest, and the xplane op/stem totals via
dropclip_tpu.core.xplane. A/B kernels with DROPCLIP_PACKED_ATTN=1 /
DROPCLIP_PALLAS_LN=1 / DROPCLIP_FUSED_ADD_LN=1. History of findings: PERF.md.

Profile ONE teacher obj-prior dispatch (8 views x K objects through
ViT-L/14@336px with random weights) on TPU and bucket xplane time by op
class: ViT matmuls, attention kernel, prompting (crop/resize), copies.
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.tools.preprocess_data import build_extractor

args = CfgNode(dict(
    clip_model="ViT-L/14@336px", clip_checkpoint=None,
    visual_prompt="crop-mask", crop_num_levels=1,
    crop_expansion_ratio=0.15, batch_size=32))
ex = build_extractor(args)

rng = np.random.default_rng(0)
V, K, H, W = 8, 12, 480, 640
images = jnp.asarray(rng.integers(0, 255, (V, H, W, 3), np.uint8))
segs = np.zeros((V, H, W), np.int32)
# K blobs per view so every object is present
for k in range(K):
    y = 40 * (k % 6) + 40
    x = 100 * (k // 6) + 80
    segs[:, y:y + 36, x:x + 90] = k + 1
segs = jnp.asarray(segs)
obj_ids = jnp.asarray(np.arange(1, K + 1))

call = lambda: ex._obj_prior_view(ex.variables, images, segs, obj_ids)
out = call()
s = float(jnp.sum(out.astype(jnp.float32)))  # sync
print("warm", out.shape, s, flush=True)

t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    s = float(jnp.sum(call().astype(jnp.float32)))
dt = (time.perf_counter() - t0) / reps
print(f"chunk: {dt*1e3:.1f} ms  -> x{73/V:.2f} chunks = "
      f"{dt*73/V:.2f} s/scene teacher", flush=True)

logdir = "/tmp/prof_teacher"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    s = float(jnp.sum(call().astype(jnp.float32)))

from dropclip_tpu.core.xplane import print_profile

print_profile(logdir, top=12)
