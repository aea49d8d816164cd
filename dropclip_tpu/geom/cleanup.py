"""Point-cloud cleanup: RANSAC plane removal + outlier filters.

TPU-native replacements for the Open3D (C++) cleanup routines the
reference calls during raw-scene handling (reference utils/geometry.py):

- ``plane_removal`` (:48-59): ``segment_plane`` RANSAC then drop the
  plane inliers. Here the RANSAC is one vectorized JAX program — all
  candidate triples are drawn at once, plane distances evaluated as a
  single (K, N) broadcast, best model by inlier count — instead of
  o3d's sequential C++ loop.
- ``remove_stat_outlier`` (:355-359): statistical outlier removal —
  keep points whose mean k-NN distance is within
  ``mean + ratio * std`` of the cloud-wide distribution.
- ``pc_outlier_removal`` (:362-380): voxel-downsample then radius
  outlier removal (keep points with >= ``min_points`` neighbors inside
  ``eps``); returns kept indices *into the downsampled cloud*, matching
  the reference's (quirky) contract.

Neighbor searches are brute-force chunked pairwise distances: the
clouds these run on are <= a few 10k points, where a (chunk, N) matmul
on the MXU beats any tree structure a TPU could host.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("ransac_n", "num_iterations"))
def segment_plane(points: jnp.ndarray, mask: jnp.ndarray,
                  distance_threshold: float = 0.01, ransac_n: int = 3,
                  num_iterations: int = 1000,
                  seed: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RANSAC plane fit. points (N, 3), mask (N,) valid. ->
    ((a, b, c, d) with |n|=1, inlier mask (N,) incl. validity)."""
    del ransac_n  # planes are fit from triples; kept for API parity
    n = points.shape[0]
    key = jax.random.PRNGKey(seed)
    # Draw all candidate triples at once; resampling collisions is not
    # worth a data-dependent loop — a degenerate triple just yields a
    # zero normal and never wins the inlier vote.
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(num_iterations, 3), p=probs)
    tri = points[idx]  # (K, 3, 3)
    normal = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    d = -jnp.sum(normal * tri[:, 0], axis=-1)  # (K,)
    # (K, N) point-plane distances
    dist = jnp.abs(points @ normal.T + d[None, :]).T
    inlier = (dist <= distance_threshold) & mask[None, :]
    inlier = inlier & (norm[:, 0:1] > 1e-9)  # kill degenerate triples
    best = jnp.argmax(inlier.sum(axis=1))
    model = jnp.concatenate([normal[best], d[best][None]])
    return model, inlier[best]


def plane_removal(points: np.ndarray, distance_threshold: float = 0.01,
                  ransac_n: int = 3, num_iterations: int = 1000
                  ) -> np.ndarray:
    """Drop the dominant plane's inliers (reference geometry.py:48-59)."""
    pts = jnp.asarray(points, jnp.float32)
    _, inlier = segment_plane(pts, jnp.ones(pts.shape[0], bool),
                              distance_threshold, ransac_n, num_iterations)
    return np.asarray(points)[~np.asarray(inlier)]


@partial(jax.jit, static_argnames=("k", "chunk"))
def _knn_mean_dist(points: jnp.ndarray, mask: jnp.ndarray, k: int,
                   chunk: int = 2048) -> jnp.ndarray:
    """Mean distance to the k nearest valid neighbors (self excluded)."""
    n = points.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    sq = jnp.sum(points ** 2, axis=-1)
    big = jnp.float32(1e30)

    def one_chunk(qc):
        d2 = (jnp.sum(qc ** 2, -1)[:, None] - 2.0 * qc @ points.T + sq[None])
        d2 = jnp.where(mask[None, :], d2, big)
        neg, _ = jax.lax.top_k(-d2, k + 1)  # incl. self at distance 0
        d = jnp.sqrt(jnp.maximum(-neg[:, 1:], 0.0))
        return jnp.mean(d, axis=-1)

    out = jax.lax.map(one_chunk, q).reshape(-1)
    return out[:n]


def remove_stat_outlier(points: np.ndarray, n_pts: int = 25,
                        ratio: float = 2.0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Statistical outlier removal (reference geometry.py:355-359):
    keep points whose mean ``n_pts``-NN distance < mean + ratio * std.
    Returns (kept points, kept indices)."""
    pts = jnp.asarray(points, jnp.float32)
    if pts.shape[0] <= 1:  # no neighbors to judge by — keep everything
        ind = np.arange(pts.shape[0])
        return np.asarray(points), ind
    md = np.asarray(_knn_mean_dist(pts, jnp.ones(pts.shape[0], bool),
                                   min(n_pts, pts.shape[0] - 1)))
    thresh = md.mean() + ratio * md.std()
    ind = np.nonzero(md < thresh)[0]
    return np.asarray(points)[ind], ind


@partial(jax.jit, static_argnames=("chunk",))
def _radius_counts(points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                   chunk: int = 2048) -> jnp.ndarray:
    """Number of valid neighbors (self excluded) within ``radius``."""
    n = points.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    sq = jnp.sum(points ** 2, axis=-1)
    r2 = jnp.float32(radius) ** 2

    def one_chunk(qc):
        d2 = (jnp.sum(qc ** 2, -1)[:, None] - 2.0 * qc @ points.T + sq[None])
        inside = (d2 <= r2) & mask[None, :]
        return inside.sum(axis=-1) - 1  # subtract self

    out = jax.lax.map(one_chunk, q).reshape(-1)
    return out[:n]


def voxel_pool(xyz: np.ndarray, payloads=None, labels=None,
               voxel_size: float = 0.0075):
    """Host voxel downsample: mean xyz + mean of each payload + majority
    label — the single host-side voxelizer (the REGRAD-ingest analogue of
    the reference's o3d voxel_down + KD-tree feature counters,
    utils/projections.py:151-211; the device path is
    ``voxelize.voxel_downsample``).

    Returns (xyz_v, {name: pooled}, labels_v) — payload dict/labels empty
    or None pass through as {} / None.
    """
    xyz = np.asarray(xyz, np.float32)
    payloads = payloads or {}
    grid = np.floor(xyz / voxel_size).astype(np.int64)
    grid -= grid.min(axis=0)
    dims = grid.max(axis=0) + 1
    key = (grid[:, 0] * dims[1] + grid[:, 1]) * dims[2] + grid[:, 2]
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    u = len(counts)

    def mean_of(arr):
        arr = np.asarray(arr)
        out = np.zeros((u,) + arr.shape[1:], np.float64)
        np.add.at(out, inv, arr)
        return (out / counts.reshape((-1,) + (1,) * (arr.ndim - 1))
                ).astype(np.float32)

    lab_out = None
    if labels is not None:
        lab_ids, lab_inv = np.unique(np.asarray(labels),
                                     return_inverse=True)
        votes = np.zeros((u, len(lab_ids)), np.int64)
        np.add.at(votes, (inv, lab_inv), 1)
        lab_out = lab_ids[np.argmax(votes, axis=1)]
    return mean_of(xyz), {k: mean_of(v) for k, v in payloads.items()}, lab_out


def pc_voxel_down(pc: np.ndarray, voxel_size: float = 0.0075) -> np.ndarray:
    """Host-side voxel-average downsample of a raw cloud (reference
    geometry.py:350-352, o3d ``voxel_down_sample``)."""
    return voxel_pool(pc, voxel_size=voxel_size)[0]


def pc_outlier_removal(pc: np.ndarray, eps: float = 0.05,
                       min_points: int = 15,
                       voxel_size: float = 0.02) -> np.ndarray:
    """Voxel-downsample then radius outlier removal (reference
    geometry.py:362-380). Returns the kept indices into the DOWNSAMPLED
    cloud — the reference's exact (quirky) contract."""
    down = pc_voxel_down(pc, voxel_size)
    counts = np.asarray(_radius_counts(
        jnp.asarray(down), jnp.ones(down.shape[0], bool), eps))
    return np.nonzero(counts >= min_points)[0]
