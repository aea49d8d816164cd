"""Fusion-core parity tests vs a numpy/torch oracle of the reference
algorithm (utils/feature_fusion.py) on a synthetic multi-view fixture:
random world points, 3 views with synthetic poses, depth maps rendered
from the projections themselves (plus injected occlusions)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.fusion.core import (  # noqa: E402
    FusionConfig,
    fuse_obj_prior,
    fuse_points,
    relative_similarity,
    splat_object_features,
    visibility_mask,
)

H, W = 48, 64
PH, PW = 6, 8
C, Q, V, N = 16, 4, 3, 80
KMAT = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]], np.float32)


def make_scene(rng):
    pts = rng.uniform(-0.25, 0.25, size=(N, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.0, 0.15, size=N)
    labels = rng.randint(0, Q, size=N).astype(np.int32)

    poses = []
    for v in range(V):
        # camera above the scene, small lateral offsets; cam->world matrix
        t = np.array([0.05 * (v - 1), 0.03 * v, 1.5 + 0.2 * v], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = t
        poses.append(T)
    poses = np.stack(poses)

    depths = np.full((V, H, W), 10.0, np.float32)
    segs = np.zeros((V, H, W), np.int32)
    for v in range(V):
        cam = (np.linalg.inv(poses[v]) @ np.c_[pts, np.ones(N)].T).T[:, :3]
        cam[:, 1] *= -1
        cam[:, 2] *= -1
        uvw = (KMAT @ cam.T).T
        uv = (uvw[:, :2] / uvw[:, 2:3]).astype(int)
        inside = (uv[:, 0] >= 0) & (uv[:, 1] >= 0) & (uv[:, 0] < W) & (uv[:, 1] < H)
        for i in np.where(inside)[0]:
            depths[v, uv[i, 1], uv[i, 0]] = uvw[i, 2]
            segs[v, uv[i, 1], uv[i, 0]] = labels[i]
        # occlude a strip of pixels in view v
        depths[v, :, 5 * v: 5 * v + 3] = 0.01

    pfeats = rng.randn(V, PH, PW, C).astype(np.float32)
    qembs = rng.randn(Q, C).astype(np.float32)
    qembs /= np.linalg.norm(qembs, axis=-1, keepdims=True)
    return pts, labels, poses, depths, segs, pfeats, qembs


# ------------------------------------------------------------------ oracle

def oracle_visibility(pts, depths, poses, thr=0.05):
    vis = np.zeros((V, N), bool)
    uvs = np.zeros((V, N, 2), int)
    zs = np.zeros((V, N))
    for v in range(V):
        cam = (np.linalg.inv(poses[v]) @ np.c_[pts, np.ones(N)].T).T[:, :3]
        cam[:, 1] *= -1
        cam[:, 2] *= -1
        uvw = (KMAT @ cam.T).T
        z = uvw[:, 2]
        uv = np.zeros((N, 2), int)
        ok = z != 0
        uv[ok] = (uvw[ok, :2] / z[ok, None]).astype(int)
        inside = (uv[:, 0] >= 0) & (uv[:, 1] >= 0) & (uv[:, 0] < W) & (uv[:, 1] < H)
        vvis = inside.copy()
        vvis[inside] = np.abs(depths[v, uv[inside, 1], uv[inside, 0]]
                              - z[inside]) <= thr
        vis[v] = vvis
        uvs[v] = uv
        zs[v] = z
    return vis, uvs


def oracle_fuse_points(pts, depths, segs, poses, pfeats, qembs, kernel,
                       use_similarity=True, eps=1e-6):
    """Transliteration of reference aggregate_features/fuse_points
    (feature_fusion.py:139-270) without the invisible-point compaction."""
    vis, uvs = oracle_visibility(pts, depths, poses)
    sum_feat = np.zeros((N, C), np.float32)
    sim_mask = np.zeros((V, N), np.float32)
    for v in range(V):
        f = torch.as_tensor(pfeats[v]).permute(2, 0, 1).unsqueeze(0)
        up = F.interpolate(f, size=(H, W), mode="bicubic",
                           align_corners=False)[0].permute(1, 2, 0)
        up = up / up.norm(dim=-1, keepdim=True)
        up = up.numpy()
        if use_similarity:
            raw = up.astype(np.float32) @ qembs.T  # (H, W, Q)
            metric = np.zeros((H, W), np.float32)
            for obj in range(Q):
                m2d = segs[v] == obj
                sim_obj = raw[m2d]
                pos = sim_obj[:, obj]
                neg = np.delete(sim_obj, obj, axis=1)
                rel = pos - (neg.max(1) if kernel == "max" else neg.mean(1))
                metric[m2d] = np.clip(rel, eps, None)
        idx = np.where(vis[v])[0]
        xs, ys = uvs[v, idx, 0], uvs[v, idx, 1]
        feat3d = up[ys, xs]
        if use_similarity:
            sim_mask[v, idx] = metric[ys, xs]
            feat3d = feat3d * metric[ys, xs][:, None]
        sum_feat[idx] += feat3d
    div = sim_mask.sum(0) if use_similarity else vis.sum(0).astype(np.float32)
    with np.errstate(invalid="ignore", divide="ignore"):
        fused = sum_feat / div[:, None]
    return fused, vis, sim_mask


def oracle_fuse_obj_prior(segs, obj_feats_dense, qembs, use_visibility,
                          use_similarity, kernel, eps=1e-6):
    """Transliteration of reference fuse_obj_prior (feature_fusion.py:
    273-343) from per-view unique-object feature lists."""
    feats = np.zeros((Q, V, C), np.float32)
    weights = np.zeros((Q, V), np.float32)
    for v in range(V):
        obj_ids = np.unique(segs[v])[1:].tolist()
        feat_v = obj_feats_dense[v][obj_ids]  # (K_v, C) reference row layout
        if use_similarity:
            fn = feat_v / np.linalg.norm(feat_v, axis=-1, keepdims=True)
            sim = fn.astype(np.float32) @ qembs.T
            simn = (sim - sim.min()) / (sim.max() - sim.min())
        for i, obj in enumerate(obj_ids):
            weights[obj, v] = 1.0
            if use_visibility:
                weights[obj, v] = float((segs[v] == obj).sum())
            if use_similarity:
                row = simn[i]
                neg = np.delete(row, obj)
                rel = row[obj] - (neg.max() if kernel == "max" else neg.mean())
                weights[obj, v] = np.clip(rel, eps, None)
            feats[obj, v] = feat_v[i]
    with np.errstate(invalid="ignore", divide="ignore"):
        fused = np.einsum("qvc,qv->qc", feats, weights) / weights.sum(1)[:, None]
    return fused, weights


# ------------------------------------------------------------------- tests

@pytest.fixture
def scene(rng):
    return make_scene(rng)


def test_visibility_matches_oracle(scene):
    pts, _, poses, depths, _, _, _ = scene
    want, _ = oracle_visibility(pts, depths, poses)
    got = np.asarray(visibility_mask(jnp.asarray(pts), jnp.asarray(depths),
                                     jnp.asarray(poses), jnp.asarray(KMAT),
                                     FusionConfig(image_hw=(H, W))))
    assert want.any() and not want.all()
    assert np.array_equal(got, want)


@pytest.mark.parametrize("kernel", ["max", "mean"])
def test_fuse_points_matches_oracle(scene, kernel):
    pts, _, poses, depths, segs, pfeats, qembs = scene
    want, want_vis, want_sim = oracle_fuse_points(
        pts, depths, segs, poses, pfeats, qembs, kernel)
    cfg = FusionConfig(image_hw=(H, W), sim_kernel=kernel)
    got = fuse_points(jnp.asarray(pts), jnp.asarray(depths), jnp.asarray(segs),
                      jnp.asarray(poses), jnp.asarray(pfeats),
                      jnp.asarray(qembs), jnp.asarray(KMAT), cfg)
    assert np.array_equal(np.asarray(got.visibility), want_vis)
    assert np.allclose(np.asarray(got.similarity), want_sim, atol=1e-4)
    vis_any = want_vis.sum(0) > 0
    assert np.allclose(np.asarray(got.features)[vis_any], want[vis_any],
                       atol=1e-3)
    assert np.array_equal(np.asarray(got.visible), vis_any)


def test_fuse_points_no_similarity(scene):
    pts, _, poses, depths, segs, pfeats, qembs = scene
    want, want_vis, _ = oracle_fuse_points(pts, depths, segs, poses, pfeats,
                                           qembs, "max", use_similarity=False)
    cfg = FusionConfig(image_hw=(H, W), use_similarity=False)
    got = fuse_points(jnp.asarray(pts), jnp.asarray(depths), jnp.asarray(segs),
                      jnp.asarray(poses), jnp.asarray(pfeats), None,
                      jnp.asarray(KMAT), cfg)
    vis_any = want_vis.sum(0) > 0
    assert np.allclose(np.asarray(got.features)[vis_any], want[vis_any],
                       atol=1e-4)


@pytest.mark.parametrize("mode", [(True, True, "max"), (True, True, "mean"),
                                  (True, False, None), (False, False, None)])
def test_fuse_obj_prior_matches_oracle(scene, rng, mode):
    use_vis, use_sim, kernel = mode
    pts, labels, poses, depths, segs, _, qembs = scene
    obj_feats = rng.randn(V, Q, C).astype(np.float32)
    present = np.zeros((V, Q), bool)
    for v in range(V):
        present[v, np.unique(segs[v])[1:]] = True
    obj_feats = obj_feats * present[..., None]

    want, want_w = oracle_fuse_obj_prior(segs, obj_feats, qembs, use_vis,
                                         use_sim, kernel)
    cfg = FusionConfig(image_hw=(H, W), use_visibility=use_vis,
                       use_similarity=use_sim, sim_kernel=kernel or "max")
    got = fuse_obj_prior(jnp.asarray(pts), jnp.asarray(depths),
                         jnp.asarray(segs), jnp.asarray(poses),
                         jnp.asarray(obj_feats), jnp.asarray(present),
                         jnp.asarray(qembs), jnp.asarray(KMAT), cfg)
    assert np.allclose(np.asarray(got.weights), want_w, atol=1e-4), mode
    seen = want_w.sum(1) > 0
    assert np.allclose(np.asarray(got.obj_features)[seen], want[seen],
                       atol=1e-4)
    # never-seen objects fuse to NaN (parity; ingest replaces with queries)
    assert np.all(np.isnan(np.asarray(got.obj_features)[~seen]))


def test_relative_similarity_kernels():
    pos = jnp.asarray([0.5, 0.1])
    neg = jnp.asarray([[0.2, 0.4], [0.3, 0.5]])
    mx = np.asarray(relative_similarity(pos, neg, "max"))
    mn = np.asarray(relative_similarity(pos, neg, "mean"))
    assert np.allclose(mx, [0.1, 1e-6])
    assert np.allclose(mn, [0.2, 1e-6])


def test_splat_object_features(rng):
    objf = rng.randn(Q, C).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 5, -1], np.int32)
    out = np.asarray(splat_object_features(jnp.asarray(labels),
                                           jnp.asarray(objf)))
    assert np.allclose(out[0], 0)   # label 0 skipped (reference :128-136)
    assert np.allclose(out[1], objf[1])
    assert np.allclose(out[4], 0)   # out of range
    assert np.allclose(out[5], 0)   # negative


def test_fuse_points_shards_over_point_axis(scene):
    """The point axis shards over the mesh (SURVEY §5's 'sequence
    parallelism' analogue): fusing with points split across 8 devices
    must produce the unsharded result — GSPMD inserts the collectives."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dropclip_tpu.core.mesh import POINT_AXIS, make_mesh

    pts, _, poses, depths, segs, pfeats, qembs = scene
    cfg = FusionConfig(image_hw=(H, W))
    args = tuple(jnp.asarray(a) for a in
                 (pts, depths, segs, poses, pfeats, qembs))
    want = fuse_points(*args[:5], args[5], jnp.asarray(KMAT), cfg)

    mesh = make_mesh(n_data=1, n_point=8)
    pad = (-N) % 8  # point dim must divide the axis; pad with far points
    pts_p = jnp.concatenate(
        [args[0], jnp.full((pad, 3), 1e3, jnp.float32)])
    pts_sh = jax.device_put(pts_p, NamedSharding(mesh, P(POINT_AXIS)))
    rest = tuple(jax.device_put(a, NamedSharding(mesh, P()))
                 for a in args[1:] + (jnp.asarray(KMAT),))

    fn = jax.jit(lambda p, d, s, cp, pf, q, k: fuse_points(
        p, d, s, cp, pf, q, k, cfg))
    got = fn(pts_sh, *rest)
    np.testing.assert_allclose(np.asarray(got.features)[:N],
                               np.asarray(want.features), atol=1e-4)
    assert np.array_equal(np.asarray(got.visibility)[:, :N],
                          np.asarray(want.visibility))
