"""Multi-view RGB-D aggregation to a labeled world-frame cloud.

TPU-native replacement for the reference's Open3D pipeline
(reference utils/geometry.py:120-204 ``aggregate_views_blender_new``):
per view, unproject valid depth pixels, apply the Blender/o3d camera-axis
flip, transform cam->world with the view's world_matrix, concatenate, and
(optionally) voxel-downsample with mean position/color and per-voxel
majority label vote. Implemented as one vmapped-unprojection + one
segment-reduce downsample, all on device with fixed shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projections import depth_to_pointcloud
from .transforms import flip_yz
from .voxelize import voxel_downsample


def unproject_views(
    depths: jnp.ndarray,
    rgbs: jnp.ndarray,
    segs: jnp.ndarray,
    camera_poses: jnp.ndarray,
    K: jnp.ndarray,
    depth_trunc: float = 25.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(V, H, W[, 3]) images -> flat world-frame cloud with validity mask.

    Returns (points (V*H*W, 3), colors, labels, valid). Valid pixels have
    0 < depth < depth_trunc (o3d RGBD semantics, geometry.py:138-152).
    uint8 rgbs are converted to 0..1 floats on device (ship the small
    dtype over the host link).
    """

    from .transforms import transform_pointcloud_to_world_frame

    def one(depth, rgb, seg, pose):
        rgb = (rgb.astype(jnp.float32) / 255.0
               if rgb.dtype == jnp.uint8 else rgb)
        cam = depth_to_pointcloud(depth, K)
        cam = flip_yz(cam)  # T_cam diag(1,-1,-1) (geometry.py:131-133)
        # _apply44 under the hood — einsum here hits the TPU batched
        # tiny-K matmul miscompile when vmapped over many views (see
        # geom.transforms._apply44)
        world = transform_pointcloud_to_world_frame(cam, pose)
        d = depth.reshape(-1)
        valid = (d > 0) & (d < depth_trunc)
        return world, rgb.reshape(-1, rgb.shape[-1]), seg.reshape(-1), valid

    pts, cols, labs, valid = jax.vmap(one)(depths, rgbs, segs, camera_poses)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return flat(pts), flat(cols), flat(labs), flat(valid)


def aggregate_views(
    depths: jnp.ndarray,
    rgbs: jnp.ndarray,
    segs: jnp.ndarray,
    camera_poses: jnp.ndarray,
    K: jnp.ndarray,
    voxel_size: Optional[float],
    capacity: int,
    num_labels: int,
    depth_trunc: float = 25.0,
    bits: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray]:
    """Full aggregation: unproject all views + voxel-downsample.

    Returns (xyz (cap, 3), rgb (cap, 3), labels (cap,), mask (cap,),
    dropped () int32 points lost to extent/capacity truncation).
    Colors/positions are voxel means, labels majority-per-voxel
    (geometry.py:186-201).
    """
    pts, cols, labs, valid = unproject_views(depths, rgbs, segs,
                                             camera_poses, K, depth_trunc)
    assert voxel_size is not None and voxel_size > 0
    return voxel_downsample(pts, cols, labs, voxel_size, capacity,
                            num_label_classes=num_labels, valid=valid,
                            bits=bits)
