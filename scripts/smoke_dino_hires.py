"""Hardware smoke for the DINO v1 hi-res extractor's attention routing.

Usage: python scripts/smoke_dino_hires.py [--px 224]  (needs the TPU).
Runs the stride-4 ViT-S/8 extractor (random weights — this checks the
compute path, not the features) through both attention routes:
descriptors (no attn capture -> one-shot/flash kernels) and saliency
(post-softmax probs captured on the last layer -> explicit path there
only). At 224 px t=3026; at 512 px t=16130 where the explicit
(B, h, t, t) matrix would be ~12 GB f32. Measured results: PERF.md
"DINO v1 hi-res attention".
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.teachers.dino_v1 import ViTExtractor

px = argparse.ArgumentParser()
px.add_argument("--px", type=int, default=224)
px = px.parse_args().px

print("backend:", jax.default_backend(), flush=True)
ex = ViTExtractor("dino_vits8", stride=4)
print("use_flash:", ex.model.use_flash, flush=True)
rng = np.random.default_rng(0)
batch = ex.preprocess(rng.integers(0, 255, (px, px, 3), np.uint8))

d = ex.extract_descriptors(batch, layer=9, facet="key")
float(jnp.sum(d.astype(jnp.float32)))  # sync
print("desc warm", d.shape, "finite:", bool(jnp.isfinite(d).all()), flush=True)
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    float(jnp.sum(ex.extract_descriptors(batch, layer=9,
                                         facet="key").astype(jnp.float32)))
t = ex.num_patches[0] * ex.num_patches[1] + 1
print(f"desc (flash path, t={t}): "
      f"{(time.perf_counter() - t0) / reps * 1e3:.1f} ms", flush=True)

sal = ex.extract_saliency_maps(batch)
print("saliency warm", sal.shape, "finite:",
      bool(jnp.isfinite(sal).all()), flush=True)
t0 = time.perf_counter()
for _ in range(reps):
    float(jnp.sum(ex.extract_saliency_maps(batch).astype(jnp.float32)))
print(f"saliency (explicit last layer): "
      f"{(time.perf_counter() - t0) / reps * 1e3:.1f} ms", flush=True)
