"""Nearest-neighbor correspondence queries.

Two implementations of the reference's KD-tree matching
(reference utils/geometry.py:390-401 ``find_closest_indices``):
- host-side scipy cKDTree (offline ingest paths);
- an on-device grid-hash 1-NN for jit pipelines (brute force in chunks —
  point sets here are <=100k, so an O(N*M/chunks) masked-argmin over
  bf16 distance tiles is MXU-friendly and far from the bottleneck).
"""

from __future__ import annotations

import numpy as np


def find_closest_indices(source: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """For every row of ``targets``, the index of its nearest ``source`` row
    (reference geometry.py:390-401 semantics)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(source))
    _, idx = tree.query(np.asarray(targets), k=1)
    return np.asarray(idx, np.int64)


def nearest_neighbor_device(source, targets, chunk: int = 2048):
    """On-device 1-NN: (N, 3) source, (M, 3) targets -> (M,) int32 indices.

    ||t - s||^2 = |t|^2 - 2 t.s + |s|^2 — the cross term is one matmul per
    chunk (MXU), argmin on the VPU.
    """
    import jax
    import jax.numpy as jnp

    source = jnp.asarray(source, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    s2 = jnp.sum(source * source, axis=1)

    def one_chunk(t):
        cross = t @ source.T  # (chunk, N)
        d = s2[None, :] - 2.0 * cross
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    m = targets.shape[0]
    pad = (-m) % chunk
    tp = jnp.pad(targets, ((0, pad), (0, 0)))
    out = jax.lax.map(one_chunk, tp.reshape(-1, chunk, 3))
    return out.reshape(-1)[:m]
