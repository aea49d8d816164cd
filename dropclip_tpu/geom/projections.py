"""Projection primitives: unproject depth maps, project point clouds.

Ports of reference utils/projections.py:59-86 plus the in-line projection
pattern repeated through utils/feature_fusion.py:95-121, as batched jnp
functions. All functions take/return fixed-shape arrays and are safe under
jit/vmap (no boolean indexing).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


def depth_to_pointcloud(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Unproject a (H, W) depth map to an (H*W, 3) camera-frame cloud
    (reference utils/projections.py:67-86: meshgrid unprojection).

    Invalid (<=0) depths produce points at the origin; callers should mask
    with ``depth.reshape(-1) > 0``.
    """
    h, w = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    z = depth
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = jnp.stack([x, jnp.broadcast_to(y, z.shape), z], axis=-1)
    return pts.reshape(-1, 3)


def pointcloud_to_pixel(points_camera: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points to continuous pixel coords (N, 2) = (u, v)
    (reference utils/projections.py:59-64)."""
    uvw = jnp.sum(K[None, :, :] * points_camera[:, None, :], axis=-1)
    z = uvw[:, 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    uv = uvw[:, :2] / safe_z[:, None]
    return jnp.where((z == 0)[:, None], 0.0, uv)


def project_points(
    points_camera: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points to integer pixels with an in-bounds mask.

    Replicates the reference's projection block (utils/feature_fusion.py:
    90-112): int truncation of u/v (assignment into an int array), zero for
    z==0 points, and the bounds test 0 <= u < W, 0 <= v < H.

    Returns:
      uv: (N, 2) int32 pixel coords (u=x, v=y), 0 where z==0.
      point_depth: (N,) the z coordinate (depth along camera axis).
      inside: (N,) bool in-bounds mask (excludes z==0 via uv=0? no — matches
        reference: z==0 points get uv=(0,0) which is in bounds; the depth
        test downstream rejects them).
    """
    # broadcast-multiply-sum, not einsum: the batched tiny-K matmul
    # miscompiles on TPU under wide vmaps (see transforms._apply44), and
    # TPU's default bf16 matmul precision shifts pixels by ~1 px anyway
    uvw = jnp.sum(K[None, :, :] * points_camera[:, None, :], axis=-1)
    z = uvw[:, 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    uv_f = uvw[:, :2] / safe_z[:, None]
    uv_f = jnp.where((z == 0)[:, None], 0.0, uv_f)
    # np float->int assignment truncates toward zero; match exactly.
    uv = jnp.trunc(uv_f).astype(jnp.int32)
    inside = ((uv[:, 0] >= 0) & (uv[:, 1] >= 0)
              & (uv[:, 0] < width) & (uv[:, 1] < height))
    return uv, z, inside


def reconstruct_feature_map(feat: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor upsample of a (ph, pw, C) patch feature map to
    (H, W, C) via integer-grid indexing (reference utils/transforms.py:149-164)."""
    H, W = image_hw
    ph, pw, _ = feat.shape
    ys = (jnp.arange(H, dtype=jnp.float32) * (ph / H)).astype(jnp.int32)
    xs = (jnp.arange(W, dtype=jnp.float32) * (pw / W)).astype(jnp.int32)
    return feat[ys[:, None], xs[None, :]]


def bicubic_upsample(feat: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic upsample of a (ph, pw, C) patch feature map to (H, W, C).

    Matches torch ``F.interpolate(..., mode='bicubic', align_corners=False)``
    used to upsample 2D teacher feature maps before splatting (reference
    utils/feature_fusion.py:167-172). Delegates to ops.resize (torch cubic
    kernel a=-0.75; jax.image.resize's Keys kernel differs).
    """
    from ..ops.resize import bicubic_resize

    return bicubic_resize(feat, image_hw)


def project_2d_features_to_3d(depth, features, K,
                              center_crop: Optional[int] = None,
                              transform_coords=None,
                              subsample_step: Optional[int] = None,
                              camera_pose=None):
    """Pair every depth pixel's 3D point with its 2D feature vector
    (reference utils/projections.py:108-147).

    depth: (H, W); features: (H, W, C) aligned per pixel (or a larger map
    cropped alongside depth when ``center_crop`` is given). Optional
    center crop, per-dataset camera-axis fix (``transform_coords``,
    reference _cvt_regrad_coord :89-92), ::step subsampling, and
    cam->world transform via ``camera_pose``. Returns (pc (N, 3),
    features (N, C)) — all jnp, jit-friendly (static crop/step).
    """
    from .transforms import transform_pointcloud_to_world_frame

    depth = jnp.asarray(depth)
    features = jnp.asarray(features)
    K = jnp.asarray(K)
    if center_crop:
        def crop(img, size):
            h, w = img.shape[:2]
            y0 = (h - size) // 2
            x0 = (w - size) // 2
            return img[y0: y0 + size, x0: x0 + size], (x0, y0)

        (depth, (x0, y0)) = crop(depth, center_crop)
        if features.shape[:2] != depth.shape[:2]:
            features, _ = crop(features, center_crop)
        # shift the principal point by the crop offset: K describes the
        # FULL image, and cropped pixel (0, 0) is full-image (x0, y0).
        # (Deviation: the reference :118-128 projects the cropped depth
        # with the uncropped intrinsics, displacing every ray.)
        K = K.at[0, 2].add(-x0).at[1, 2].add(-y0)
    pc = depth_to_pointcloud(depth, K).reshape(-1, 3)
    features = features.reshape(-1, features.shape[-1])
    if transform_coords is not None:
        pc = transform_coords(pc)
    if subsample_step:
        pc = pc[::subsample_step]
        features = features[::subsample_step]
    if camera_pose is not None:
        pc = transform_pointcloud_to_world_frame(pc, jnp.asarray(camera_pose))
    return pc, features


def pool_multiview_features(aggr_pc, aggr_features):
    """Max-pool features over duplicate 3D points (reference
    utils/projections.py:245-261). Host-side (numpy), like the reference:
    runs once per scene during offline ingest, outside the jit path.
    Returns (unique_points (U, 3), pooled (U, C))."""
    aggr_pc = np.asarray(aggr_pc)
    aggr_features = np.asarray(aggr_features)
    uniq, inv = np.unique(aggr_pc, axis=0, return_inverse=True)
    pooled = np.full((len(uniq), aggr_features.shape[-1]), -np.inf,
                     aggr_features.dtype)
    np.maximum.at(pooled, inv, aggr_features)
    return uniq, pooled
