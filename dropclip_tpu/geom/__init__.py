from .camera import CameraIntrinsics
from .transforms import (
    transform_pointcloud_to_camera_frame,
    transform_pointcloud_to_world_frame,
    transform_poses_to_camera_frame,
    transform_poses_to_world_frame,
    flip_yz,
)
from .projections import (
    depth_to_pointcloud,
    pointcloud_to_pixel,
    project_points,
    reconstruct_feature_map,
)
from .voxelize import sparse_quantize, voxel_downsample, ravel_grid_coords
from .cleanup import (
    pc_outlier_removal,
    pc_voxel_down,
    plane_removal,
    remove_stat_outlier,
    segment_plane,
)
