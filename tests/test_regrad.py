"""REGRAD dataset tests over a synthetic fixture mirroring the on-disk
format (pickled grasp/cloud files, objects json, processed h5)."""

import json
import os
import pickle

import numpy as np
import pytest

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.data.dataset_regrad import MAX_POINTS, RegradDistilDataset
from dropclip_tpu.data.regrad import VIEWS_MAPPING, RegradDataset


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    """Minimal raw REGRAD tree: 1 scene, 2 views with pickles + images."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("regrad")
    rng = np.random.RandomState(0)
    split = root / "train"
    for d in ("grasps/s0001", "rgb", "depth", "seg"):
        (split / d).mkdir(parents=True)
    n = 200
    for v in (1, 2):
        data = {
            "view_cloud": rng.randn(n, 3).astype(np.float32),
            "view_cloud_color": rng.rand(n, 3).astype(np.float32),
            "view_cloud_label": rng.randint(0, 3, n),
            "scene_cloud": rng.randn(50, 3).astype(np.float32),
            "valid_index": np.arange(10),
            "select_frame": np.tile(np.eye(4), (10, 1, 1)),
            "select_score": rng.rand(10),
            "select_frame_label": rng.randint(0, 3, 10),
        }
        with open(split / "grasps/s0001" / f"s0001_view_{v}.p", "wb") as f:
            pickle.dump(data, f)
        iv = VIEWS_MAPPING[v]
        cv2.imwrite(str(split / "rgb" / f"s0001_{iv}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8).tolist() and
                    rng.randint(0, 255, (48, 64, 3)).astype(np.uint8))
        cv2.imwrite(str(split / "depth" / f"s0001_{iv}.png"),
                    rng.randint(100, 2000, (48, 64)).astype(np.uint16))
        seg = rng.randint(0, 3, (48, 64)).astype(np.uint8)
        seg[0, 0] = 250  # white background pixel
        cv2.imwrite(str(split / "seg" / f"s0001_{iv}.png"), seg)
    objs = {"s0001": {str(v): [
        {"obj_id": 1, "model_name": "mug", "6D_pose": [0, 0, 0, 0, 0, 0, 1],
         "bbox": [0, 0, 10, 10], "minAreaRect": None, "exists": True},
        {"obj_id": 2, "model_name": "bowl", "6D_pose": [0.1, 0, 0, 0, 0, 0, 1],
         "bbox": [5, 5, 15, 15], "minAreaRect": None, "exists": True},
    ] for v in range(1, 10)}}
    (split / "objects.json").write_text(json.dumps(objs))
    np.save(root / "camera_info.npy",
            {"extrinsic": {v: np.eye(4) for v in range(1, 10)}},
            allow_pickle=True)
    return str(root)


def raw_cfg(root):
    return CfgNode(dict(root_dir=root, num_views=2, camera_file="camera_info.npy",
                        grasp_dir="grasps", RGB_dir="rgb", Depth_dir="depth",
                        Seg_dir="seg", reference_frame="world", with_depth=True,
                        with_seg=True, with_grasp=True,
                        include_pc_filtered=False, image_resize=None))


def test_raw_reader(raw_root):
    ds = RegradDataset(raw_cfg(raw_root), "train")
    assert len(ds) == 1
    scene = ds[0]
    assert scene["views"][1]["valid"]
    assert scene["views"][2]["valid"]
    v1 = scene["views"][1]
    assert v1["pc_xyz"].shape == (200, 3)
    assert v1["pc_label"].min() >= 1  # labels shifted +1
    assert v1["depth"].dtype == np.float32 and v1["depth"].max() < 3.0
    assert (v1["segm2d"] >= 200).sum() == 0  # white bg removed
    assert scene["aggr"]["pc_xyz"].shape == (400, 3)
    assert 1 in scene["grasps"] and scene["grasps"][1]["grasp_poses"].shape == (10, 4, 4)
    assert set(v1["6D_poses"]) == {1, 2}


@pytest.fixture(scope="module")
def processed_root(tmp_path_factory):
    import h5py

    root = tmp_path_factory.mktemp("regrad_proc")
    rng = np.random.RandomState(1)
    (root / "processed" / "train").mkdir(parents=True)
    n, k, c = 500, 3, 16
    with h5py.File(root / "processed" / "train" / "s0001.h5py", "w") as f:
        pc = f.create_group("pointcloud")
        pc.create_dataset("xyz", data=rng.randn(n, 3).astype(np.float32) * 0.1)
        pc.create_dataset("rgb", data=rng.rand(n, 3).astype(np.float32))
        pc.create_dataset("label", data=rng.randint(0, k, n).astype(np.uint8))
        mv = f.create_group("multiview")
        feats = rng.randn(k, c).astype(np.float32)
        mv.create_dataset("per_obj", data=feats)
        mv.create_dataset("obj_ids", data=np.arange(k), dtype="uint8")
    objs = {"s0001": [
        {"obj_id": 1, "model_name": "mug", "exists": True},
        {"obj_id": 2, "model_name": "bowl", "exists": True},
    ]}
    (root / "objects.json").write_text(json.dumps(objs))
    (root / "cls_map.json").write_text(json.dumps({"mug": 7, "bowl": 9}))
    return str(root)


def test_regrad_distil_dataset(processed_root):
    cfg = CfgNode(dict(
        processed_dir=os.path.join(processed_root, "processed"),
        objects_train_path=os.path.join(processed_root, "objects.json"),
        cls_map_path=os.path.join(processed_root, "cls_map.json"),
        voxel_size=0.02, voxel_capacity=512, use_color=True,
        use_augmentation=False, manual_seed=42, evaluate=False))
    ds = RegradDistilDataset(cfg, "train")
    assert len(ds) == 1
    item = ds[0]
    assert item["coords"].shape == (512, 3)
    assert item["in_feats"].shape == (512, 6)
    assert item["targets"].shape == (512, 16)
    m = item["mask"]
    assert m.sum() > 50
    # class labels: instances 1,2 mapped, everything else 255
    lc = item["labels_cls"][m]
    assert set(np.unique(lc)) <= {7, 9, 255}
    assert (lc != 255).sum() > 0
    # grounding queries by model name
    assert item["queries"] == {"mug": [1], "bowl": [2]}
    batch = RegradDistilDataset.collate([item, item])
    assert batch["labels_cls"].shape == (2, 512)
