"""SE(3) transforms for point clouds and pose arrays, plus 2D coordinate
scaling between image / crop / patch grids.

Semantics match reference utils/transforms.py:43-146, implemented as pure
jnp functions (usable under jit/vmap, differentiable, batched).
"""

from __future__ import annotations

import jax.numpy as jnp


def _as_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    ones = jnp.ones((*points.shape[:-1], 1), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def transform_pointcloud_to_world_frame(points: jnp.ndarray,
                                        camera_pose: jnp.ndarray) -> jnp.ndarray:
    """cam->world: x_w = T @ [x_c;1] (reference utils/transforms.py:43-49).

    ``camera_pose`` is the camera-to-world 4x4 matrix ("world_matrix").
    Supports leading batch dims on points.
    """
    h = _as_homogeneous(points)
    return jnp.einsum("ij,...j->...i", camera_pose, h)[..., :3]


def transform_pointcloud_to_camera_frame(points: jnp.ndarray,
                                         camera_pose: jnp.ndarray) -> jnp.ndarray:
    """world->cam: x_c = T^-1 @ [x_w;1] (reference utils/transforms.py:52-61)."""
    inv = jnp.linalg.inv(camera_pose)
    h = _as_homogeneous(points)
    return jnp.einsum("ij,...j->...i", inv, h)[..., :3]


def transform_poses_to_camera_frame(poses: jnp.ndarray,
                                    camera_pose: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) poses world->cam (reference utils/transforms.py:64-80)."""
    inv = jnp.linalg.inv(camera_pose)
    return jnp.einsum("ij,njk->nik", inv, poses)


def transform_poses_to_world_frame(poses: jnp.ndarray,
                                   camera_pose: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) poses cam->world (reference utils/transforms.py:83-96)."""
    return jnp.einsum("ij,njk->nik", camera_pose, poses)


def flip_yz(points: jnp.ndarray) -> jnp.ndarray:
    """Negate y and z — the OpenGL/Blender <-> CV camera-axis convention flip
    applied after world->cam (reference utils/feature_fusion.py:76-79
    ``_cvt_o3d_coords`` and utils/projections.py:95-97 ``_cvt_blender_coord``).
    """
    return points * jnp.asarray([1.0, -1.0, -1.0], dtype=points.dtype)


class CoordTransform2d:
    """Scale (x, y) between image / crop / patch coordinate grids
    (reference utils/transforms.py:99-146). Pure-jnp, truncating like the
    reference's ``.long()`` casts."""

    def __init__(self, img_dim, patch_size, resize_dim=None):
        self.height, self.width = img_dim
        self.crop_size = resize_dim or img_dim
        self.patch_size = patch_size
        self.patch_h = self.crop_size[0] / patch_size
        self.patch_w = self.crop_size[1] / patch_size

    @staticmethod
    def _transform(x, y, scale_h, scale_w):
        x = jnp.asarray(x * scale_w).astype(jnp.int32)
        y = jnp.asarray(y * scale_h).astype(jnp.int32)
        return x, y

    def img_to_patch(self, x, y):
        return self._transform(x, y, self.patch_h / self.height, self.patch_w / self.width)

    def patch_to_img(self, x, y):
        return self._transform(x, y, self.height / self.patch_h, self.width / self.patch_w)

    def crop_to_patch(self, x, y):
        return self._transform(x, y, self.patch_h / self.crop_size[0], self.patch_w / self.crop_size[1])

    def patch_to_crop(self, x, y):
        return self._transform(x, y, self.crop_size[0] / self.patch_h, self.crop_size[1] / self.patch_w)

    def img_to_crop(self, x, y):
        return self._transform(x, y, self.crop_size[0] / self.height, self.crop_size[1] / self.width)

    def crop_to_img(self, x, y):
        return self._transform(x, y, self.height / self.crop_size[0], self.width / self.crop_size[1])
