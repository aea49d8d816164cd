"""Object-centric multi-view feature fusion (the paper's core algorithm)."""

from .core import (  # noqa: F401
    FusionConfig,
    fuse,
    fuse_obj_prior,
    fuse_points,
    relative_similarity,
    splat_object_features,
    visibility_mask,
)
