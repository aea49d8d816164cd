import jax.numpy as jnp
import numpy as np
import pytest

from dropclip_tpu.geom import (
    CameraIntrinsics,
    depth_to_pointcloud,
    flip_yz,
    pointcloud_to_pixel,
    project_points,
    transform_pointcloud_to_camera_frame,
    transform_pointcloud_to_world_frame,
    transform_poses_to_camera_frame,
    transform_poses_to_world_frame,
)
from dropclip_tpu.geom.projections import reconstruct_feature_map


def random_pose(rng):
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = q
    T[:3, 3] = rng.randn(3)
    return T


def test_world_camera_roundtrip(rng):
    pts = rng.randn(100, 3).astype(np.float32)
    T = random_pose(rng)
    cam = transform_pointcloud_to_camera_frame(jnp.asarray(pts), jnp.asarray(T))
    back = transform_pointcloud_to_world_frame(cam, jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_pose_roundtrip(rng):
    poses = np.stack([random_pose(rng) for _ in range(5)])
    T = random_pose(rng)
    cam = transform_poses_to_camera_frame(jnp.asarray(poses), jnp.asarray(T))
    back = transform_poses_to_world_frame(cam, jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(back), poses, atol=1e-4)


def test_transform_matches_numpy_reference(rng):
    """Against the reference formula: x_c = inv(T) @ [x;1] (transforms.py:52-61)."""
    pts = rng.randn(50, 3)
    T = random_pose(rng)
    expected = (np.linalg.inv(T) @ np.vstack([pts.T, np.ones((1, 50))]))[:3].T
    got = transform_pointcloud_to_camera_frame(jnp.asarray(pts), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_flip_yz():
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(flip_yz(p)), [[1.0, -2.0, -3.0]])


def test_unproject_project_roundtrip():
    cam = CameraIntrinsics.mvtod()
    depth = jnp.full((480, 640), 1.5)
    pts = depth_to_pointcloud(depth, cam.K)
    uv = pointcloud_to_pixel(pts, cam.K)
    u = np.asarray(uv[:, 0]).reshape(480, 640)
    v = np.asarray(uv[:, 1]).reshape(480, 640)
    np.testing.assert_allclose(u[0], np.arange(640), atol=1e-3)
    np.testing.assert_allclose(v[:, 0], np.arange(480), atol=1e-3)


def test_project_points_bounds_and_depth():
    cam = CameraIntrinsics.mvtod()
    pts = jnp.asarray([
        [0.0, 0.0, 1.0],     # center, visible
        [10.0, 0.0, 1.0],    # way off to the side -> out of bounds
        [0.0, 0.0, 0.0],     # z == 0 -> uv forced to 0 (reference semantics)
        [0.0, 0.0, -1.0],    # behind camera
    ])
    uv, z, inside = project_points(pts, cam.K, cam.width, cam.height)
    uv, z, inside = np.asarray(uv), np.asarray(z), np.asarray(inside)
    assert inside[0] and uv[0, 0] == 319 and uv[0, 1] == 239
    assert not inside[1]
    assert inside[2] and uv[2, 0] == 0 and uv[2, 1] == 0  # matches reference quirk
    assert z[3] == -1.0


def test_reconstruct_feature_map_shape():
    feat = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    out = reconstruct_feature_map(feat, (8, 9))
    assert out.shape == (8, 9, 4)
    # top-left pixel maps to patch (0,0)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(feat[0, 0]))


def test_mvtod_intrinsics():
    cam = CameraIntrinsics.mvtod()
    assert cam.width == 640 and cam.height == 480
    assert abs(cam.fx - 444.44444444) < 1e-6
    assert cam.cx == 319.5 and cam.cy == 239.5


def test_project_2d_features_to_3d(rng):
    from dropclip_tpu.geom.projections import (depth_to_pointcloud,
                                               project_2d_features_to_3d)

    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32)
    depth = rng.uniform(0.5, 2.0, (24, 32)).astype(np.float32)
    feats = rng.randn(24, 32, 5).astype(np.float32)
    pc, f = project_2d_features_to_3d(depth, feats, K)
    assert pc.shape == (24 * 32, 3) and f.shape == (24 * 32, 5)
    want = np.asarray(depth_to_pointcloud(jnp.asarray(depth),
                                          jnp.asarray(K))).reshape(-1, 3)
    assert np.allclose(np.asarray(pc), want)
    # center crop aligns a larger feature map with the cropped depth
    big = rng.randn(48, 64, 5).astype(np.float32)
    pc2, f2 = project_2d_features_to_3d(depth, big, K, center_crop=16,
                                        subsample_step=2)
    assert pc2.shape == (128, 3) and f2.shape == (128, 5)
    assert np.allclose(np.asarray(f2)[0], big[16 + 0, 24 + 0])
    # cropped rays must MATCH the full-image rays at the same pixels
    # (principal point shifted by the crop offset; the reference gets
    # this wrong — documented deviation)
    pc_full = np.asarray(pc).reshape(24, 32, 3)
    pc_crop = np.asarray(project_2d_features_to_3d(
        depth, feats, K, center_crop=16)[0]).reshape(16, 16, 3)
    assert np.allclose(pc_crop, pc_full[4:20, 8:24], atol=1e-5)
    # world transform
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    pc3, _ = project_2d_features_to_3d(depth, feats, K, camera_pose=T)
    assert np.allclose(np.asarray(pc3), np.asarray(pc) + [1, 2, 3],
                       atol=1e-5)


def test_pool_multiview_features(rng):
    from dropclip_tpu.geom.projections import pool_multiview_features

    pts = np.repeat(rng.randn(10, 3).astype(np.float32), 3, axis=0)
    feats = rng.randn(30, 4).astype(np.float32)
    uniq, pooled = pool_multiview_features(pts, feats)
    assert uniq.shape == (10, 3)
    for i, p in enumerate(uniq):
        rows = np.all(pts == p, axis=1)
        assert np.allclose(pooled[i], feats[rows].max(axis=0))
