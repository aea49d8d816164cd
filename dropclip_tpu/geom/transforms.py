"""SE(3) transforms for point clouds and pose arrays, plus 2D coordinate
scaling between image / crop / patch grids.

Semantics match reference utils/transforms.py:43-146, implemented as pure
jnp functions (usable under jit/vmap, differentiable, batched).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _as_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    ones = jnp.ones((*points.shape[:-1], 1), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def _apply44(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (..., 3) points via broadcast-multiply-sum.

    NOT a matmul/einsum: XLA TPU miscompiles the batched tiny-K matmul
    this produces under vmap over >~32 transforms (observed: camera-frame
    points off by ~1.0 at 36 views, correct at 8 — the same pathology as
    batched jnp.linalg.inv). Elementwise ops sidestep the bad kernel, and
    with K=4 the VPU form wastes nothing.
    """
    T = T.astype(points.dtype)
    out = jnp.sum(T[..., :3, :3][..., None, :, :]
                  * points[..., None, :], axis=-1)
    return out + T[..., None, :3, 3]


def transform_pointcloud_to_world_frame(points: jnp.ndarray,
                                        camera_pose: jnp.ndarray) -> jnp.ndarray:
    """cam->world: x_w = T @ [x_c;1] (reference utils/transforms.py:43-49).

    ``camera_pose`` is the camera-to-world 4x4 matrix ("world_matrix").
    Supports leading batch dims on points.
    """
    return _apply44(camera_pose, points)


def affine_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) affine transforms (last row
    [0,0,0,1]): adjugate 3x3 via cross products + translation.

    jnp.linalg.inv MISCOMPILES on TPU when vmapped over >~32 matrices
    under jit (observed: camera transforms off by >1.0 at 36 views, fine
    at 8); camera poses are affine, so the closed form is exact and pure
    elementwise math.
    """
    T = T.astype(jnp.float32)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    a, b, c = R[..., :, 0], R[..., :, 1], R[..., :, 2]  # columns
    r0 = jnp.cross(b, c)
    r1 = jnp.cross(c, a)
    r2 = jnp.cross(a, b)
    det = jnp.sum(a * r0, axis=-1, keepdims=True)[..., None]
    inv3 = jnp.stack([r0, r1, r2], axis=-2) / det
    ti = -jnp.einsum("...ij,...j->...i", inv3, t,
                     precision=lax.Precision.HIGHEST)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(inv3)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_pointcloud_to_camera_frame(points: jnp.ndarray,
                                         camera_pose: jnp.ndarray) -> jnp.ndarray:
    """world->cam: x_c = T^-1 @ [x_w;1] (reference utils/transforms.py:52-61)."""
    # affine_inverse + _apply44, not jnp.linalg.inv + einsum: both the
    # batched tiny inverse and the batched tiny-K matmul miscompile on
    # TPU under wide vmaps (see their docstrings).
    return _apply44(affine_inverse(camera_pose), points)


def transform_poses_to_camera_frame(poses: jnp.ndarray,
                                    camera_pose: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) poses world->cam (reference utils/transforms.py:64-80)."""
    # affine_inverse (not jnp.linalg.inv — TPU batched-inv miscompile,
    # see its docstring); 4x4 matmul chains here are single (not wide-
    # vmapped), which has tested safe, and HIGHEST precision is pinned.
    inv = affine_inverse(camera_pose)
    return jnp.einsum("ij,njk->nik", inv, poses,
                      precision=lax.Precision.HIGHEST)


def transform_poses_to_world_frame(poses: jnp.ndarray,
                                   camera_pose: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) poses cam->world (reference utils/transforms.py:83-96)."""
    return jnp.einsum("ij,njk->nik", camera_pose, poses,
                      precision=lax.Precision.HIGHEST)


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
