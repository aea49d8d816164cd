"""Data-pipeline tests over the synthetic miniature MV-TOD: h5 round trip,
quantizer parity with the jnp version, dataset semantics (NaN removal,
partial views, padding, determinism), loader sharding/prefetch, queries."""

import numpy as np
import pytest

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.data.dataset_blender import MAX_POINTS, MVTODDataset, build_dataset
from dropclip_tpu.data.loader import DataLoader
from dropclip_tpu.data.queries import prepare_fusion_queries, prepare_queries
from dropclip_tpu.data.scene_io import read_scene, write_scene
from dropclip_tpu.data.synthetic import make_raw_scene, write_fake_processed_dataset
from dropclip_tpu.data.voxelize_np import sparse_quantize_np


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mvtod"))
    write_fake_processed_dataset(root, n_scenes=3, n_objects=3, feat_dim=16,
                                 n_views=4)
    return root


def make_cfg(**kw):
    base = dict(root_dir=None, voxel_size=0.05, voxel_capacity=512,
                use_full_pc=False, use_k_views=3, use_color=True,
                use_augmentation=False, eval_scenario="cls", manual_seed=42,
                evaluate=True)
    base.update(kw)
    return CfgNode(base)


def test_h5_roundtrip(tmp_path, rng):
    xyz = rng.randn(50, 3).astype(np.float32)
    rgb = rng.rand(50, 3).astype(np.float32)
    label = rng.randint(0, 4, 50)
    vis = rng.rand(3, 50) > 0.5
    feats = rng.randn(4, 8).astype(np.float32)
    info = {0: {"cls_name": "table"}, 1: {"cls_name": "mug"}}
    p = str(tmp_path / "s" / "s.h5py")
    write_scene(p, xyz, rgb, label, vis, feats, info)
    s = read_scene(p)
    assert np.allclose(s.xyz, xyz)
    assert np.array_equal(s.label, label)
    assert np.array_equal(s.vis_mask, vis)
    assert np.allclose(s.obj_feats, feats)
    assert s.objects_info == info


def test_np_quantizer_matches_jnp(rng):
    import jax.numpy as jnp

    from dropclip_tpu.geom.voxelize import sparse_quantize

    xyz = rng.randn(300, 3).astype(np.float32) * 0.3
    labels = rng.randint(0, 5, 300).astype(np.int32)
    a = sparse_quantize_np(xyz, 0.05, 256, labels=labels, ignore_label=0)
    b = sparse_quantize(jnp.asarray(xyz), 0.05, 256,
                        labels=jnp.asarray(labels), ignore_label=0)
    assert np.array_equal(a.coords, np.asarray(b.coords))
    assert np.array_equal(a.mask, np.asarray(b.mask))
    assert np.array_equal(a.inverse_map, np.asarray(b.inverse_map))
    assert np.array_equal(a.labels, np.asarray(b.labels))
    assert np.array_equal(a.unique_idx, np.asarray(b.unique_idx))


def test_dataset_item_shapes(fake_root):
    cfg = make_cfg(root_dir=fake_root)
    ds = MVTODDataset(cfg, "train")
    assert len(ds) == 3
    item = ds[0]
    cap = 512
    assert item["coords"].shape == (cap, 3)
    assert item["mask"].shape == (cap,)
    assert item["in_feats"].shape == (cap, 6)  # xyz + rgb
    assert item["targets"].shape == (cap, 16)
    assert item["labels"].shape == (cap,)
    assert item["mask"].sum() > 10
    # padding rows zeroed
    pad = ~item["mask"]
    assert np.allclose(item["in_feats"][pad], 0)
    assert np.allclose(item["targets"][pad], 0)
    assert item["queries"]  # non-empty query dict
    assert item["inverse_map"].shape == (MAX_POINTS,)


def test_dataset_deterministic_per_epoch(fake_root):
    cfg = make_cfg(root_dir=fake_root, use_augmentation=True,
                   aug_random_shift=True, aug_random_rotation=True,
                   aug_random_rot_chance=0.5, aug_rotate_min_x=-0.1,
                   aug_rotate_max_x=0.1, aug_rotate_min_y=-0.1,
                   aug_rotate_max_y=0.1, aug_rotate_min_z=-0.1,
                   aug_rotate_max_z=0.1, aug_random_euler_order=True,
                   aug_elastic_distortion_granularity_min=0.1,
                   aug_elastic_distortion_granularity_max=0.2,
                   aug_elastic_distortion_magnitude_min=0.2,
                   aug_elastic_distortion_magnitude_max=0.4,
                   use_color_augmentation=True)
    ds = MVTODDataset(cfg, "train")
    a, b = ds[1], ds[1]
    assert np.array_equal(a["coords"], b["coords"])
    assert np.allclose(a["targets"], b["targets"])
    ds.set_epoch(1)
    c = ds[1]
    assert not np.array_equal(a["coords"], c["coords"])


def test_nan_object_removed(fake_root, tmp_path):
    cfg = make_cfg(root_dir=fake_root)
    ds = MVTODDataset(cfg, "train")
    path, _ = ds.data[0]
    s = read_scene(path)
    feats = s.obj_feats.copy()
    feats[2] = np.nan
    import os

    p2 = str(tmp_path / "nan_scene" / "x.h5py")
    write_scene(p2, s.xyz, s.rgb, s.label, s.vis_mask, feats, s.objects_info)
    ds.data = [(p2, -1)]
    item = ds[0]
    labs = item["labels"][item["mask"]]
    assert 2 not in np.unique(labs)


def test_fixed_view_ids(fake_root):
    cfg = make_cfg(root_dir=fake_root, use_k_views=1, use_view_ids="0,2")
    ds = MVTODDataset(cfg, "train")
    assert len(ds) == 6  # 3 scenes x 2 views
    item = ds[0]
    assert item["view_id"] == 0


def test_loader_sharding_and_batching(fake_root):
    cfg = make_cfg(root_dir=fake_root, use_k_views=1, use_view_ids="0,1,2,3")
    ds = MVTODDataset(cfg, "train")  # 12 items
    dl = DataLoader(ds, batch_size=2, collate=MVTODDataset.collate,
                    num_workers=3, seed=1)
    batches = list(dl)
    assert len(batches) == 6
    assert batches[0]["coords"].shape[0] == 2
    # two shards cover disjoint items
    d0 = DataLoader(ds, batch_size=2, collate=MVTODDataset.collate,
                    shard_index=0, num_shards=2, seed=1)
    d1 = DataLoader(ds, batch_size=2, collate=MVTODDataset.collate,
                    shard_index=1, num_shards=2, seed=1)
    s0 = [sid for b in d0 for sid in b["scene_id"]]
    v0 = [v for b in d0 for v in b["view_id"]]
    s1 = [sid for b in d1 for sid in b["scene_id"]]
    v1 = [v for b in d1 for v in b["view_id"]]
    assert len(set(zip(s0, v0)) & set(zip(s1, v1))) == 0
    assert len(s0) + len(s1) == 12


def test_prepare_queries_scenarios():
    info = {
        0: {"cls_name": "table", "queries": {}},
        1: {"cls_name": "mug", "queries": {"Color": ["red"], "State": [],
                                           "Material": ["ceramic"],
                                           "Affordance": ["drink"],
                                           "More descriptions": ["a red mug"]}},
        2: {"cls_name": "bowl", "queries": {"Color": ["blue"], "State": [],
                                            "Material": ["ceramic"]}},
        3: {"cls_name": "bowl", "queries": {"Color": ["green"], "State": [],
                                            "Material": ["ceramic"]}},
    }
    cls = prepare_queries(info, "cls")
    assert cls == {1: ["mug"]}
    amb = prepare_queries(info, "ambiguous")
    assert amb == {2: ["blue"], 3: ["green"]}
    both = prepare_queries(info, "cls+attr")
    assert both == {1: ["mug"], 2: ["blue"], 3: ["green"]}
    aff = prepare_queries(info, "affordance")
    assert aff == {1: ["drink"]}
    op = prepare_queries(info, "open")
    assert op == {1: ["a red mug", "mug"]}


def test_prepare_fusion_queries():
    info = {
        0: {"cls_name": "table", "concepts": None},
        1: {"cls_name": "mug",
            "concepts": {"Color": ["red"], "State": [], "Material": [],
                         "Brand": "acme"}},
    }
    q = prepare_fusion_queries(info, "cls+attr")
    assert q == {0: ["table"], 1: ["mug", "red", "acme"]}


def test_raw_scene_consistency(rng):
    raw = make_raw_scene(np.random.default_rng(0))
    n = len(raw["points"])
    assert raw["depths"].shape[0] == raw["segs"].shape[0] == 4
    assert raw["labels"].max() == 3
    # rendered depth at a projected pixel matches the point depth somewhere
    assert (raw["depths"] < 9.0).sum() > 50


# ---- use_view_clip (reference dataset_blender.py:52-71, 133-171) ----

VC_HW = (48, 64)


def _write_vc_raw(raw_root, scene_ids, n_views=4, seed=3):
    """Tiny raw tree (rgb pngs + cameras json) matching processed ids."""
    import json
    import os

    import cv2

    from dropclip_tpu.data.synthetic import make_camera_ring

    r = np.random.default_rng(seed)
    poses = make_camera_ring(n_views)
    for sid in scene_ids:
        d = os.path.join(raw_root, "train", sid)
        os.makedirs(d, exist_ok=True)
        cams = {}
        for v in range(n_views):
            img = r.integers(0, 255, VC_HW + (3,), np.uint8)
            cv2.imwrite(os.path.join(d, f"image.{sid}.rgb.{v:04d}.png"),
                        img[:, :, ::-1])
            cams[f"{v:04d}"] = {"world_matrix": poses[v].tolist()}
        json.dump(cams, open(os.path.join(d, f"cameras.{sid}.json"), "w"))


def _vc_cfg(fake_root, raw_root, **kw):
    return make_cfg(root_dir=fake_root, use_k_views=0, use_view_ids="1",
                    use_view_clip=True, raw_root=raw_root,
                    view_clip_model="tiny-test", view_clip_resize=(32, 32),
                    view_clip_hw=VC_HW,
                    view_clip_intrinsics=(50.0, 50.0, 31.5, 23.5), **kw)


@pytest.fixture(scope="module")
def vc_raw(fake_root, tmp_path_factory):
    raw_root = str(tmp_path_factory.mktemp("vc_raw"))
    ids = sorted(s for s in __import__("os").listdir(
        __import__("os").path.join(fake_root, "train")))
    _write_vc_raw(raw_root, ids)
    return raw_root


@pytest.mark.slow
def test_view_clip_item_layout_and_cache(fake_root, vc_raw):
    ds = MVTODDataset(_vc_cfg(fake_root, vc_raw), "train")
    item = ds[0]
    # input = xyz(3) + rgb(3) + view CLIP(16, tiny-test embed_dim)
    assert item["in_feats"].shape[-1] == 3 + 3 + 16
    assert np.isfinite(item["in_feats"]).all()
    assert np.all(item["in_feats"][~item["mask"]] == 0)
    # targets still the fused per-obj features, untouched
    assert item["targets"].shape[-1] == 16
    ds[0]
    assert len(ds._vc_cache) == 1  # patch map LRU hit on the repeat


@pytest.mark.slow
def test_view_clip_sampling_oracle(fake_root, vc_raw):
    """_view_clip_features == project+clip, then index the MATERIALIZED
    bicubic-upsampled patch map (the reference's computation, :152-170)."""
    from dropclip_tpu.data.synthetic import make_camera_ring
    from dropclip_tpu.ops.resize import bicubic_resize

    ds = MVTODDataset(_vc_cfg(fake_root, vc_raw), "train")
    sid = sorted(__import__("os").listdir(
        __import__("os").path.join(fake_root, "train")))[0]
    r = np.random.default_rng(1)
    xyz = r.normal(size=(200, 3)).astype(np.float64) * 0.4
    got = ds._view_clip_features(xyz, sid, 1)

    pose = make_camera_ring(4)[1].astype(np.float64)
    cam = (np.linalg.inv(pose) @ np.concatenate(
        [xyz, np.ones((200, 1))], 1).T).T[:, :3]
    cam[:, 1:] *= -1.0
    K = np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]])
    uvw = (K @ cam.T).T
    z = uvw[:, 2]
    px = np.zeros(200, np.int64)
    py = np.zeros(200, np.int64)
    px[z != 0] = (uvw[z != 0, 0] / z[z != 0]).astype(np.int64)
    py[z != 0] = (uvw[z != 0, 1] / z[z != 0]).astype(np.int64)
    px, py = np.clip(px, 0, 63), np.clip(py, 0, 47)
    pf = ds._vc_patch_map(sid, 1)
    full = np.asarray(bicubic_resize(pf, VC_HW))          # (48, 64, 16)
    want = full[py, px]
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_view_clip_alignment_through_getitem(fake_root, vc_raw, monkeypatch):
    """Per-point alignment: with view_feat := world xyz, (view_feat -
    centered xyz) must be the SAME constant (the centroid) on every
    occupied voxel row."""
    ds = MVTODDataset(_vc_cfg(fake_root, vc_raw), "train")
    monkeypatch.setattr(
        ds, "_view_clip_features",
        lambda xyz, sid, vid: xyz.astype(np.float32).copy())
    item = ds[0]
    occ = item["in_feats"][item["mask"]]
    delta = occ[:, 6:9] - occ[:, :3]
    assert np.allclose(delta, delta[0], atol=1e-5)


def test_view_clip_requires_single_views(fake_root, vc_raw):
    cfg = _vc_cfg(fake_root, vc_raw)
    cfg["use_k_views"] = 3
    cfg["use_view_ids"] = None
    ds = MVTODDataset(cfg, "train")
    with pytest.raises(ValueError, match="use_view_clip"):
        ds[0]


def test_make_volumetric_coords_depth_statistics():
    """The volumetric generator (scripts/ab_pillar_conv.py --workload
    volumetric) must produce DEEP z columns — whole boxes, no random
    voxel truncation punching holes — or the pillar-vs-brick A/B
    measures noise instead of the layout regime it claims to."""
    from collections import Counter

    from dropclip_tpu.data.synthetic import make_volumetric_coords

    rng = np.random.RandomState(0)
    coords, mask = make_volumetric_coords(rng, 2, 8192, n_occ=6000,
                                          ext=20, zext=32)
    assert coords.shape == (2, 8192, 3) and mask.shape == (2, 8192)
    for b in range(2):
        cc = coords[b][mask[b]]
        assert len(cc) == 6000
        assert len(np.unique(cc, axis=0)) == len(cc)  # no duplicates
        assert cc[:, 2].min() >= 0 and cc[:, 2].max() < 32
        assert np.abs(cc[:, :2]).max() <= 20
        depth = np.array(list(Counter(map(tuple, cc[:, :2])).values()))
        # mean occupied z per site: tabletop scenes sit at ~2; the
        # volumetric regime needs genuinely deep columns
        assert depth.mean() > 8.0, depth.mean()
