"""Projection + image-utils parity vs the ACTUAL reference source.

Executes the reference's own numpy/torch/cv2 code (utils/projections.py,
utils/image.py) on shared fixtures and asserts dropclip_tpu matches:

- utils/projections.py depth_to_pointcloud / pointcloud_to_pixel /
  project_2d_features_to_3d / pool_multiview_features / apply_pca
                                  -> dropclip_tpu.geom.projections, viz
- utils/image.py mask2box (+multi-level), borders, seg<->masks, contours
                                  -> dropclip_tpu.data.image_utils,
                                     dropclip_tpu.teachers.prompting

Documented deviations exercised here:
- apply_pca: ours normalizes per component (better color spread) vs the
  reference's global minmax, and raw-SVD signs vs sklearn's svd_flip —
  parity is asserted on the projection SUBSPACE (|corr| per component).
- project_2d_features_to_3d center_crop: ours fixes the reference's
  uncropped-intrinsics bug (projections.py:118-128), so the crop branch
  is intentionally NOT compared.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ref_oracle import ref_module

torch = pytest.importorskip("torch")


def _intr(rng):
    fx, fy = 420.0 + rng.rand() * 50, 430.0 + rng.rand() * 50
    cx, cy = 31.0 + rng.rand(), 23.0 + rng.rand()
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    return {"fx": fx, "fy": fy, "cx": cx, "cy": cy}, K


# ----------------------------------------------------------- projections

def test_depth_to_pointcloud_parity(rng):
    ref_p = ref_module("utils.projections")
    from dropclip_tpu.geom.projections import depth_to_pointcloud

    intr, K = _intr(rng)
    depth = (rng.rand(48, 64) * 2.0).astype(np.float64)
    depth[rng.rand(48, 64) < 0.1] = 0.0

    ref = ref_p.depth_to_pointcloud(depth, intr).reshape(-1, 3)
    ours = np.asarray(depth_to_pointcloud(jnp.asarray(depth),
                                          jnp.asarray(K)))
    assert np.allclose(ref, ours, atol=1e-5)


def test_pointcloud_to_pixel_parity(rng):
    ref_p = ref_module("utils.projections")
    from dropclip_tpu.geom.projections import pointcloud_to_pixel

    intr, K = _intr(rng)
    pts = rng.randn(200, 3)
    pts[:, 2] = 0.3 + rng.rand(200) * 2.0  # strictly positive depth

    ref = ref_p.pointcloud_to_pixel(pts, intr)
    ours = np.asarray(pointcloud_to_pixel(jnp.asarray(pts), jnp.asarray(K)))
    assert np.allclose(ref, ours, atol=1e-4)


def test_project_2d_features_to_3d_parity(rng):
    """No-crop path with the REGRAD axis fix, ::2 subsample, and the
    world transform — the reference's own utils.transforms does the
    world step on its side."""
    ref_p = ref_module("utils.projections")
    from dropclip_tpu.geom.projections import project_2d_features_to_3d

    intr, K = _intr(rng)
    depth = (0.4 + rng.rand(24, 32)).astype(np.float64)
    feats = rng.randn(24, 32, 5).astype(np.float64)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4)
    pose[:3, :3] = q
    pose[:3, 3] = rng.randn(3)

    ref_pc, ref_f = ref_p.project_2d_features_to_3d(
        depth.copy(), feats.copy(), intr, center_crop=None,
        transform_to_world=True, transform_coords=ref_p._cvt_regrad_coord,
        subsample_step=2, camera_extrinsics=pose)

    our_pc, our_f = project_2d_features_to_3d(
        jnp.asarray(depth), jnp.asarray(feats), jnp.asarray(K),
        transform_coords=lambda p: p * jnp.asarray([1.0, -1.0, -1.0]),
        subsample_step=2, camera_pose=jnp.asarray(pose))
    assert np.allclose(ref_pc, np.asarray(our_pc), atol=1e-4)
    assert np.allclose(ref_f, np.asarray(our_f), atol=1e-6)


def test_pool_multiview_features_parity(rng):
    ref_p = ref_module("utils.projections")
    from dropclip_tpu.geom.projections import pool_multiview_features

    # duplicated integer points (multi-view revisits of the same voxel)
    pts = rng.randint(0, 6, size=(300, 3)).astype(np.float64)
    feats = rng.randn(300, 7).astype(np.float64)

    ref_u, ref_f = ref_p.pool_multiview_features(pts, feats)
    our_u, our_f = pool_multiview_features(pts, feats)
    assert np.array_equal(ref_u, our_u)
    assert np.allclose(ref_f, our_f, atol=1e-12)


def test_apply_pca_subspace_parity(rng):
    ref_p = ref_module("utils.projections")
    from dropclip_tpu.viz import apply_pca

    feats = (rng.randn(400, 16) @ rng.randn(16, 16)).astype(np.float64)
    ref = ref_p.apply_pca(feats, norm=False)
    ours = np.asarray(apply_pca(feats))
    for c in range(3):
        corr = np.corrcoef(ref[:, c], ours[:, c])[0, 1]
        assert abs(corr) > 0.999, (c, corr)


# ----------------------------------------------------------- image utils

def _blob_mask(rng, h=40, w=56):
    m = np.zeros((h, w), bool)
    cy, cx = rng.randint(8, h - 8), rng.randint(10, w - 10)
    yy, xx = np.mgrid[:h, :w]
    m[(yy - cy) ** 2 + ((xx - cx) * 0.7) ** 2 < rng.randint(20, 60)] = True
    return m


def test_mask2box_parity(rng):
    ref_i = ref_module("utils.image")
    from dropclip_tpu.data.image_utils import mask2box
    from dropclip_tpu.teachers.prompting import mask_to_box

    for _ in range(5):
        m = _blob_mask(rng)
        ref = ref_i.mask2box(torch.from_numpy(m))
        assert mask2box(m) == tuple(ref)
        assert tuple(np.asarray(mask_to_box(jnp.asarray(m)))) == tuple(ref)


def test_mask2box_multi_level_parity(rng):
    ref_i = ref_module("utils.image")
    from dropclip_tpu.data.image_utils import mask2box_multi_level

    for level in (0, 1, 2):
        m = _blob_mask(rng)
        ref = ref_i.mask2box_multi_level(m, level, expansion_ratio=0.15)
        ours = mask2box_multi_level(m, level, expansion_ratio=0.15)
        assert tuple(ours) == tuple(ref), (level, ref, ours)


def test_add_borders_parity(rng):
    ref_i = ref_module("utils.image")
    from dropclip_tpu.data.image_utils import add_borders_to_image

    for h, w in ((30, 60), (60, 30), (40, 40)):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ref = ref_i.add_borders_to_image(img, 1.0, use_color=127)
        ours = add_borders_to_image(img, 1.0, use_color=127)
        assert np.array_equal(ref, ours)


def test_seg_binary_roundtrip_parity(rng):
    ref_i = ref_module("utils.image")
    from dropclip_tpu.data.image_utils import (binary_masks_to_seg,
                                               seg_continuous_ids,
                                               seg_mask_to_binary)

    seg = rng.randint(0, 5, size=(20, 24)).astype(np.uint8) * 3  # gappy ids
    ref_masks = ref_i.seg_mask_to_binary(seg)
    our_masks = seg_mask_to_binary(seg)
    assert np.array_equal(ref_masks, our_masks)

    ids = np.unique(seg)
    ref_seg = ref_i.binary_masks_to_seg(ref_masks, ids)
    our_seg = binary_masks_to_seg(our_masks, ids)
    assert np.array_equal(ref_seg, our_seg)
    assert np.array_equal(ref_seg, seg)  # non-overlapping roundtrip

    # overlapping masks: reference resolves by MAX id
    overlap = our_masks.copy()
    overlap[1, :10, :10] = True
    overlap[3, :10, :10] = True
    assert np.array_equal(ref_i.binary_masks_to_seg(overlap, ids),
                          binary_masks_to_seg(overlap, ids))

    assert np.array_equal(ref_i.seg_continuous_ids(seg),
                          seg_continuous_ids(seg))


def test_contour_bbox_center_obb_parity(rng, monkeypatch):
    # the reference's get_oriented_bounding_box uses np.int0, an alias
    # numpy 2.x removed; restore it for the reference call only
    monkeypatch.setattr(np, "int0", np.intp, raising=False)
    ref_i = ref_module("utils.image")
    from dropclip_tpu.data.image_utils import (get_mask_bbox,
                                               get_mask_center,
                                               get_oriented_bounding_box)

    m = _blob_mask(rng)
    assert list(ref_i.get_mask_bbox(m)) == list(get_mask_bbox(m))
    assert tuple(ref_i.get_mask_center(m)) == tuple(get_mask_center(m))
    assert np.array_equal(ref_i.get_oriented_bounding_box(m),
                          get_oriented_bounding_box(m))
