"""Tests for geom/cleanup.py (reference utils/geometry.py:48-59,350-380)."""

import numpy as np

import jax.numpy as jnp

from dropclip_tpu.geom.cleanup import (
    pc_outlier_removal,
    pc_voxel_down,
    plane_removal,
    remove_stat_outlier,
    segment_plane,
)


def _plane_plus_blob(rng, n_plane=2000, n_blob=300):
    plane = np.stack([rng.uniform(-1, 1, n_plane),
                      rng.uniform(-1, 1, n_plane),
                      rng.normal(0, 0.002, n_plane)], axis=1)
    blob = rng.normal(0, 0.05, (n_blob, 3)) + np.array([0.2, 0.1, 0.3])
    return np.concatenate([plane, blob]).astype(np.float32)


def test_segment_plane_finds_dominant_plane(rng):
    pts = _plane_plus_blob(rng)
    model, inlier = segment_plane(jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), 0.01)
    model = np.asarray(model)
    # normal ~ +-z, offset ~ 0
    assert abs(abs(model[2]) - 1.0) < 0.05 and abs(model[3]) < 0.02
    inlier = np.asarray(inlier)
    assert inlier[:2000].mean() > 0.98  # plane points captured
    assert inlier[2000:].mean() < 0.1  # blob mostly untouched


def test_plane_removal_keeps_objects(rng):
    pts = _plane_plus_blob(rng)
    kept = plane_removal(pts, distance_threshold=0.01)
    # blob survives, plane gone
    assert 250 <= len(kept) <= 450
    assert np.linalg.norm(kept.mean(axis=0) - [0.2, 0.1, 0.3]) < 0.05


def test_segment_plane_respects_validity_mask(rng):
    pts = _plane_plus_blob(rng)
    # mark the plane invalid: the fit must find something else
    mask = np.ones(len(pts), bool)
    mask[:2000] = False
    _, inlier = segment_plane(jnp.asarray(pts), jnp.asarray(mask), 0.01)
    assert not np.any(np.asarray(inlier)[:2000])


def test_remove_stat_outlier(rng):
    dense = rng.normal(0, 0.05, (1000, 3)).astype(np.float32)
    far = np.array([[5.0, 5, 5], [-6, 0, 2], [0, 8, -3]], np.float32)
    pts = np.concatenate([dense, far])
    kept, ind = remove_stat_outlier(pts, n_pts=25, ratio=2.0)
    assert not set(range(1000, 1003)) & set(ind.tolist())
    assert len(ind) > 950
    assert np.allclose(kept, pts[ind])


def test_pc_voxel_down(rng):
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    down = pc_voxel_down(pts, voxel_size=0.25)
    assert down.shape[0] <= 4 ** 3 + 3 ** 3  # <= number of touched voxels
    assert down.shape[0] > 32
    # each output is a mean of points inside one voxel
    assert down.min() > 0 and down.max() < 1


def test_pc_outlier_removal(rng):
    dense = rng.normal(0, 0.02, (2000, 3)).astype(np.float32)
    far = rng.normal(0, 0.01, (5, 3)).astype(np.float32) + 3.0
    pts = np.concatenate([dense, far])
    ind = pc_outlier_removal(pts, eps=0.05, min_points=15, voxel_size=0.02)
    down = pc_voxel_down(pts, voxel_size=0.02)
    kept = down[ind]
    # the far mini-cluster voxels have too few neighbors -> dropped
    assert np.all(np.linalg.norm(kept, axis=1) < 1.0)
    assert len(ind) > 0.5 * len(down) - 10
