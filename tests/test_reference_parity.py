"""Parity vs the ACTUAL reference source (not transliterations).

Executes the reference's own torch/numpy code from /root/reference
(imported via ref_oracle's dependency stubs) on shared fixtures and
asserts dropclip_tpu matches:

- utils/transforms.py           -> dropclip_tpu.geom.transforms
- models/similarity.py          -> dropclip_tpu.similarity
- utils/feature_fusion.py       -> dropclip_tpu.fusion.core
  (fusion IS the paper's contribution — the highest-risk surface)
- utils/augmentations.py        -> dropclip_tpu.data.augmentations
  (deterministic color math; the random draws are shimmed)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ref_oracle import make_ref_clip_similarity, ref_module

torch = pytest.importorskip("torch")


# ------------------------------------------------------------- transforms

def test_transform_pointcloud_roundtrip_parity(rng):
    ref_t = ref_module("utils.transforms")
    from dropclip_tpu.geom import transforms as ours

    pts = rng.randn(50, 3).astype(np.float64)
    # a valid SE(3) pose (rotation via QR, det +1)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4)
    pose[:3, :3] = q
    pose[:3, 3] = rng.randn(3)

    ref_cam = ref_t.transform_pointcloud_to_camera_frame(pts, pose)
    our_cam = np.asarray(ours.transform_pointcloud_to_camera_frame(
        jnp.asarray(pts, jnp.float32), jnp.asarray(pose, jnp.float32)))
    assert np.allclose(ref_cam, our_cam, atol=1e-4)

    ref_world = ref_t.transform_pointcloud_to_world_frame(ref_cam, pose)
    our_world = np.asarray(ours.transform_pointcloud_to_world_frame(
        jnp.asarray(our_cam), jnp.asarray(pose, jnp.float32)))
    assert np.allclose(ref_world, pts, atol=1e-4)
    assert np.allclose(ref_world, our_world, atol=1e-4)


def test_transform_poses_parity(rng):
    ref_t = ref_module("utils.transforms")
    from dropclip_tpu.geom import transforms as ours

    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    cam_pose = np.eye(4)
    cam_pose[:3, :3] = q
    cam_pose[:3, 3] = rng.randn(3)

    poses = np.tile(np.eye(4), (7, 1, 1))
    for i in range(7):
        r, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(r) < 0:
            r[:, 0] *= -1
        poses[i, :3, :3] = r
        poses[i, :3, 3] = rng.randn(3)

    ref_cam = ref_t.transform_poses_to_camera_frame(poses, cam_pose)
    our_cam = np.asarray(ours.transform_poses_to_camera_frame(
        jnp.asarray(poses, jnp.float32), jnp.asarray(cam_pose, jnp.float32)))
    assert np.allclose(ref_cam, our_cam, atol=1e-4)

    ref_back = ref_t.transform_poses_to_world_frame(ref_cam, cam_pose)
    our_back = np.asarray(ours.transform_poses_to_world_frame(
        jnp.asarray(our_cam), jnp.asarray(cam_pose, jnp.float32)))
    assert np.allclose(ref_back, poses, atol=1e-4)
    assert np.allclose(ref_back, our_back, atol=1e-4)


def test_reconstruct_feature_map_parity(rng):
    ref_t = ref_module("utils.transforms")
    from dropclip_tpu.geom import reconstruct_feature_map

    feat = torch.tensor(rng.randn(6, 8, 5).astype(np.float32))
    ref_out = ref_t.reconstruct_feature_map(feat, (24, 32, 3))
    ours = np.asarray(reconstruct_feature_map(
        jnp.asarray(feat.numpy()), (24, 32)))
    assert np.allclose(ref_out.numpy(), ours)


# ------------------------------------------------------------- similarity

@pytest.fixture
def sim_fixture(rng):
    c = 24
    texts = ["mug", "object", "thing", "texture", "stuff"]
    table = {}
    for t in texts:
        e = rng.randn(c).astype(np.float32)
        table[t] = e / np.linalg.norm(e)
    feats = rng.randn(40, c).astype(np.float32)
    return table, feats


@pytest.mark.parametrize("method", ["paired", "argmax"])
def test_predict_parity(sim_fixture, method):
    table, feats = sim_fixture
    ref = make_ref_clip_similarity(table)
    try:
        ref_pred, ref_sims = ref.predict(
            torch.tensor(feats.copy()), "mug",
            ["object", "thing", "texture", "stuff"], method=method,
            threshold=0.75)
    finally:
        ref.restore()

    from dropclip_tpu.similarity import predict_from_embeddings

    pos = jnp.asarray(table["mug"])
    negs = jnp.asarray(np.stack([table[t] for t in
                                 ("object", "thing", "texture", "stuff")]))
    our_pred, our_sims = predict_from_embeddings(
        jnp.asarray(feats), pos, negs, method=method, threshold=0.75)

    assert np.array_equal(np.asarray(our_pred), ref_pred.numpy())
    assert np.allclose(np.asarray(our_sims), ref_sims.numpy(), atol=2e-5)


def test_predict_parity_no_negatives(sim_fixture):
    table, feats = sim_fixture
    ref = make_ref_clip_similarity(table)
    try:
        ref_pred, ref_sims = ref.predict(torch.tensor(feats.copy()), "mug",
                                         None, threshold=0.6)
    finally:
        ref.restore()

    from dropclip_tpu.similarity import predict_from_embeddings

    our_pred, our_sims = predict_from_embeddings(
        jnp.asarray(feats), jnp.asarray(table["mug"]), None, threshold=0.6)
    assert np.array_equal(np.asarray(our_pred), ref_pred.numpy())
    assert np.allclose(np.asarray(our_sims), ref_sims.numpy(), atol=2e-5)


# ----------------------------------------------------------------- fusion

def _ref_mvff(K, hw, use_similarity=True, use_visibility=True,
              kernel="max", use_obj_prior=True, feature_size=16):
    ff = ref_module("utils.feature_fusion")
    intr = {"fx": float(K[0, 0]), "fy": float(K[1, 1]),
            "cx": float(K[0, 2]), "cy": float(K[1, 2])}
    return ff.MultiviewFeatureFusion(
        camera_intrinsic=intr, image_size=hw, feature_size=feature_size,
        use_visibility=use_visibility, use_similarity=use_similarity,
        use_sim_kernel=kernel if use_similarity else None,
        use_obj_prior=use_obj_prior, device="cpu")


@pytest.fixture(scope="module")
def scene():
    from dropclip_tpu.data.synthetic import make_raw_scene

    rng = np.random.default_rng(3)
    return make_raw_scene(rng, n_objects=3, n_points_per_obj=100,
                          n_views=4, hw=(48, 64))


def test_visibility_mask_parity(scene):
    from dropclip_tpu.fusion.core import FusionConfig, visibility_mask

    mv = _ref_mvff(scene["K"], (48, 64))
    ref_vis = mv.get_visibility_mask(
        scene["points"].astype(np.float64), list(scene["depths"]),
        list(scene["poses"]), device="cpu").numpy().astype(bool)

    cfg = FusionConfig(image_hw=(48, 64))
    ours = np.asarray(visibility_mask(
        jnp.asarray(scene["points"]), jnp.asarray(scene["depths"]),
        jnp.asarray(scene["poses"]), jnp.asarray(scene["K"]), cfg))
    assert ref_vis.shape == ours.shape
    # f32-vs-f64 projection rounding may flip boundary pixels on a few
    # points; demand near-exact agreement
    agree = (ref_vis == ours).mean()
    assert agree > 0.995, agree


@pytest.mark.parametrize("kernel", ["max", "mean"])
def test_fuse_obj_prior_parity(scene, kernel):
    """Object-level fusion (the paper's central algorithm) vs the
    reference's own fuse_obj_prior on identical per-view object features."""
    from dropclip_tpu.fusion.core import FusionConfig, fuse_obj_prior

    rng = np.random.default_rng(7)
    n_obj = 3
    q = n_obj + 1  # incl. table
    c = 768  # the reference hardcodes 768 in fuse_obj_prior (:306)
    v = scene["depths"].shape[0]
    query_embs = rng.normal(size=(q, c)).astype(np.float32)
    query_embs /= np.linalg.norm(query_embs, axis=-1, keepdims=True)

    # per-(view, object-id) teacher features + reference-format ragged list
    feats_table = rng.normal(size=(v, q, c)).astype(np.float32)
    mv_features, present = [], np.zeros((v, q), bool)
    for vi in range(v):
        ids = np.unique(scene["segs"][vi])[1:]  # reference :305 skips first
        present[vi, ids] = True
        mv_features.append(torch.tensor(feats_table[vi, ids]))

    mv = _ref_mvff(scene["K"], (48, 64), kernel=kernel, feature_size=c)
    (ref_obj, ref_w, ref_vis), _ = mv.fuse_obj_prior(
        scene["points"].astype(np.float64), scene["colors"].copy(),
        scene["labels"].copy(), list(scene["depths"]), list(scene["segs"]),
        list(scene["poses"]), mv_features,
        torch.tensor(query_embs), return_obj=True, device="cpu")

    cfg = FusionConfig(image_hw=(48, 64), sim_kernel=kernel)
    obj_feats = np.where(present[:, :, None], feats_table, 0.0)
    res = fuse_obj_prior(
        jnp.asarray(scene["points"]), jnp.asarray(scene["depths"]),
        jnp.asarray(scene["segs"]), jnp.asarray(scene["poses"]),
        jnp.asarray(obj_feats), jnp.asarray(present),
        jnp.asarray(query_embs), jnp.asarray(scene["K"]), cfg)

    assert np.allclose(np.asarray(res.weights), ref_w.numpy(), atol=1e-4)
    assert np.allclose(np.asarray(res.obj_features), ref_obj.numpy(),
                       atol=1e-4, equal_nan=True)


def test_fuse_points_parity(scene):
    """Point-level path: the reference materializes bicubic-upsampled
    (H, W, C) maps (feature_fusion.py:167-172); ours samples the bicubic
    at projected pixels. Same values, checked against real torch."""
    from dropclip_tpu.fusion.core import FusionConfig, fuse_points

    rng = np.random.default_rng(11)
    c, ph, pw = 16, 6, 8
    v = scene["depths"].shape[0]
    q = 4
    patch_feats = rng.normal(size=(v, ph, pw, c)).astype(np.float32)
    query_embs = rng.normal(size=(q, c)).astype(np.float32)
    query_embs /= np.linalg.norm(query_embs, axis=-1, keepdims=True)

    mv = _ref_mvff(scene["K"], (48, 64), feature_size=c)
    pts64 = scene["points"].astype(np.float64)
    # the reference DROPS never-visible points before returning
    # (feature_fusion.py:256-262); its full-shape mask comes from the
    # (identical) get_visibility_mask code path
    ref_vis_full = mv.get_visibility_mask(
        pts64, list(scene["depths"]), list(scene["poses"]),
        device="cpu").numpy().astype(bool)
    ref_keep = ref_vis_full.any(axis=0)
    (ref_fused, _, _), _ = mv.fuse_points(
        pts64, scene["colors"].copy(), scene["labels"].copy(),
        list(scene["depths"]), list(scene["segs"]), list(scene["poses"]),
        [torch.tensor(f) for f in patch_feats],
        torch.tensor(query_embs), device="cpu")

    cfg = FusionConfig(image_hw=(48, 64))
    res = fuse_points(
        jnp.asarray(scene["points"]), jnp.asarray(scene["depths"]),
        jnp.asarray(scene["segs"]), jnp.asarray(scene["poses"]),
        jnp.asarray(patch_feats), jnp.asarray(query_embs),
        jnp.asarray(scene["K"]), cfg)

    vis_ours = np.asarray(res.visibility)
    agree = (vis_ours == ref_vis_full).mean()
    assert agree > 0.995, agree

    # compare fused features only where visibility AND projected pixels
    # agree in every view (f32-vs-f64 rounding flips boundary pixels on a
    # few points; a flipped pixel legitimately changes that point's sum)
    from dropclip_tpu.fusion.core import _project_view
    from dropclip_tpu.geom.transforms import flip_yz

    same_uv = np.ones(len(pts64), bool)
    K = scene["K"]
    for vi in range(v):
        cam = ref_module("utils.transforms").transform_pointcloud_to_camera_frame(
            pts64, scene["poses"][vi])
        cam[:, 1] *= -1
        cam[:, 2] *= -1
        uvw = (K @ cam.T).T
        ref_uv = np.zeros((len(pts64), 2), int)
        nz = uvw[:, 2] != 0
        ref_uv[nz] = (uvw[nz, :2] / uvw[nz, 2:3]).astype(int)
        our_uv, _, _ = _project_view(
            jnp.asarray(scene["points"]), jnp.asarray(scene["poses"][vi]),
            jnp.asarray(K), 64, 48)
        in_view = ref_vis_full[vi] | vis_ours[vi]
        same_uv &= ~in_view | (np.asarray(our_uv) == ref_uv).all(axis=1)

    same_vis = (vis_ours == ref_vis_full).all(axis=0)
    keep = np.asarray(res.visible) & same_vis & same_uv
    assert keep.sum() > 0.9 * ref_keep.sum()
    ours_f = np.asarray(res.features)[keep]
    # ref_fused rows = original points where ref_keep; keep implies
    # ref_keep (same_vis + visible), so restrict keep to those rows
    ref_f = ref_fused.numpy()[keep[ref_keep]]
    assert ours_f.shape == ref_f.shape
    assert np.allclose(ours_f, ref_f, atol=5e-3), (
        np.abs(ours_f - ref_f).max())


# ----------------------------------------------------------- augmentations

def test_hsv_color_math_parity(rng):
    """HueSaturationTranslation's vectorized rgb<->hsv (reference
    augmentations.py:76-119) round-trips identically in ours."""
    ref_aug = ref_module("utils.augmentations")
    from dropclip_tpu.data import augmentations as ours

    rgb = rng.randint(0, 256, size=(200, 3)).astype(np.uint8)
    ref_hsv = ref_aug.HueSaturationTranslation.rgb_to_hsv(
        rgb.astype(np.float64))
    our_hsv = ours.rgb_to_hsv(rgb.astype(np.float64))
    assert np.allclose(ref_hsv, our_hsv)
    ref_back = ref_aug.HueSaturationTranslation.hsv_to_rgb(ref_hsv)
    our_back = ours.hsv_to_rgb(our_hsv)
    assert np.allclose(ref_back, our_back)


def test_elastic_distortion_math_parity(rng):
    """ElasticDistortion's displacement interpolation (reference
    augmentations.py:242-264) with IDENTICAL noise: same output coords."""
    ref_aug = ref_module("utils.augmentations")
    from dropclip_tpu.data import augmentations as ours

    coords = rng.uniform(-0.4, 0.4, size=(150, 3)).astype(np.float32)
    granularity, magnitude = 0.2, 0.4

    # reference draws noise inside via global np.random; seed to capture
    np.random.seed(123)
    ref_out = ref_aug.ElasticDistortion(None).elastic_distortion(
        coords.copy(), granularity, magnitude)

    np.random.seed(123)

    class _GlobalRng:
        """Shim driving our implementation off the same global stream."""

        def standard_normal(self, size=None):
            return np.random.randn(*size)

        def random(self, size=None):
            return np.random.random(size)

    our_out = ours.ElasticDistortion.distort(
        coords.copy(), granularity, magnitude, _GlobalRng())
    assert np.allclose(ref_out, our_out, atol=1e-5)
