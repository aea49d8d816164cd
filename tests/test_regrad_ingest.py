"""REGRAD offline ingest e2e (reference tools/preprocess_data.py:431-607):
geometry-consistent raw fixture -> process_regrad_scene -> processed h5
-> RegradDistilDataset."""

import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.data.regrad import VIEWS_MAPPING, RegradDataset

H, W = 48, 64
KMAT = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("regrad_ingest")
    split = root / "train"
    for d in ("Points/s0001", "RGBImages", "DepthImages",
              "SegmentationImages"):
        (split / d).mkdir(parents=True)
    rng = np.random.RandomState(0)
    # two clusters at z < 0: the REGRAD camera flip gives z_cam > 0
    obj_pts = {0: rng.normal([0.1, 0.05, -1.0], 0.03, (150, 3)),
               1: rng.normal([-0.12, -0.06, -1.1], 0.03, (150, 3))}
    for v in (1, 2):
        pts = np.concatenate(list(obj_pts.values())).astype(np.float32)
        labs = np.concatenate([np.full(150, k) for k in obj_pts])
        flip = pts * np.array([1, -1, -1])
        uvw = flip @ KMAT.T
        uv = (uvw[:, :2] / uvw[:, 2:3]).astype(int)
        seg = np.zeros((H, W), np.uint8)
        inside = ((uv[:, 0] >= 0) & (uv[:, 1] >= 0) & (uv[:, 0] < W)
                  & (uv[:, 1] < H))
        seg[uv[inside, 1], uv[inside, 0]] = labs[inside] + 1
        data = {"view_cloud": pts,
                "view_cloud_color": rng.rand(len(pts), 3).astype(np.float32),
                "view_cloud_label": labs, "scene_cloud": pts[:50],
                "valid_index": np.arange(10),
                "select_frame": np.tile(np.eye(4), (10, 1, 1)),
                "select_score": rng.rand(10),
                "select_frame_label": rng.randint(0, 2, 10)}
        with open(split / "Points/s0001" / f"s0001_view_{v}.p", "wb") as f:
            pickle.dump(data, f)
        iv = VIEWS_MAPPING[v]
        cv2.imwrite(str(split / "RGBImages" / f"s0001_{iv}.jpg"),
                    rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
        cv2.imwrite(str(split / "DepthImages" / f"s0001_{iv}.png"),
                    rng.randint(100, 2000, (H, W)).astype(np.uint16))
        cv2.imwrite(str(split / "SegmentationImages" / f"s0001_{iv}.png"),
                    seg)
    objs = {"s0001": {str(v): [
        {"obj_id": 1, "model_name": "mug", "6D_pose": [0, 0, 0, 0, 0, 0, 1],
         "bbox": None, "minAreaRect": None},
        {"obj_id": 2, "model_name": "bowl",
         "6D_pose": [0.1, 0, 0, 0, 0, 0, 1], "bbox": None,
         "minAreaRect": None}] for v in range(1, 10)}}
    (split / "objects.json").write_text(json.dumps(objs))
    np.save(root / "camera_info.npy",
            {"extrinsic": {v: np.eye(4) for v in range(1, 10)},
             "intrinsic": KMAT}, allow_pickle=True)
    return str(root)


def _reader_cfg(root):
    return CfgNode(dict(
        root_dir=root, num_views=9, camera_file="camera_info.npy",
        grasp_dir="Points", RGB_dir="RGBImages", Depth_dir="DepthImages",
        Seg_dir="SegmentationImages", reference_frame="world",
        with_depth=True, with_seg=True, with_grasp=True,
        include_pc_filtered=False, image_resize=None))


def test_regrad_ingest_roundtrip(raw_root, tmp_path):
    from dropclip_tpu.data.dataset_regrad import RegradDistilDataset
    from dropclip_tpu.tools.preprocess_data import (build_extractor,
                                                    process_regrad_scene)

    ds = RegradDataset(_reader_cfg(raw_root), "train")
    scene = ds[0]
    ex = build_extractor(CfgNode(dict(
        clip_model="tiny-test", clip_checkpoint=None, visual_prompt="crop",
        crop_num_levels=1, crop_expansion_ratio=0.15, batch_size=8)))
    out = str(tmp_path / "proc" / "train" / "s0001.h5py")
    poses = {v: np.eye(4) for v in range(1, 10)}
    stats = process_regrad_scene(scene, poses, KMAT, ex, out,
                                 voxel_size=0.02)
    # cleanup keeps most points (seg rendered from the same projections)
    assert stats["points"] > 100 and stats["objects"] == 2
    assert stats["views"] == 2

    import h5py

    with h5py.File(out) as f:
        assert f["multiview"]["per_obj"].shape[0] == 2
        assert f["multiview"]["patch"].shape == (stats["points"], 16)
        labels = f["pointcloud"]["label"][:]
    assert set(np.unique(labels)) <= {1, 2}
    # per-point patch features are normalized view-means -> bounded norm
    with h5py.File(out) as f:
        norms = np.linalg.norm(f["multiview"]["patch"][:], axis=-1)
    assert norms.max() < 1.0 + 1e-4

    # the consumer loads it
    json.dump({"s0001": [{"obj_id": 1, "model_name": "mug"},
                         {"obj_id": 2, "model_name": "bowl"}]},
              open(tmp_path / "proc" / "objects.json", "w"))
    json.dump({"mug": 3, "bowl": 5},
              open(tmp_path / "proc" / "cls_map.json", "w"))
    cfg = CfgNode(dict(
        processed_dir=str(tmp_path / "proc"), voxel_capacity=512,
        voxel_size=0.02, use_color=True, manual_seed=42,
        use_augmentation=False,
        objects_train_path=str(tmp_path / "proc" / "objects.json"),
        objects_val_path=str(tmp_path / "proc" / "objects.json"),
        cls_map_path=str(tmp_path / "proc" / "cls_map.json")))
    item = RegradDistilDataset(cfg, "train")[0]
    assert item["coords"].shape[0] == 512
    assert set(np.asarray(item["obj_ids"]).tolist()) == {1, 2}


def test_patch_feat_key(raw_root, tmp_path):
    """feat_key 'patch' loads the per-point fused features (reference
    data/dataset.py:118-120)."""
    from dropclip_tpu.data.dataset_regrad import RegradDistilDataset
    from dropclip_tpu.tools.preprocess_data import (build_extractor,
                                                    process_regrad_scene)

    ds = RegradDataset(_reader_cfg(raw_root), "train")
    ex = build_extractor(CfgNode(dict(
        clip_model="tiny-test", clip_checkpoint=None, visual_prompt="crop",
        crop_num_levels=1, crop_expansion_ratio=0.15, batch_size=8)))
    out = str(tmp_path / "proc" / "train" / "s0001.h5py")
    process_regrad_scene(ds[0], {v: np.eye(4) for v in range(1, 10)}, KMAT,
                         ex, out, voxel_size=0.02)
    cfg = CfgNode(dict(processed_dir=str(tmp_path / "proc"),
                       voxel_capacity=256, voxel_size=0.02, use_color=True,
                       manual_seed=42, use_augmentation=False,
                       feat_key="patch"))
    item = RegradDistilDataset(cfg, "train")[0]
    assert item["targets"].shape[-1] == 16
    assert np.abs(item["targets"]).sum() > 0
