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


def test_camera_frame_scene_conversion(raw_root):
    """reference_frame='camera' moves per-view clouds + grasp poses into
    each view's camera frame (reference utils/transforms.py:5-16 applied
    at data/regrad.py:279-281); the aggregate stays world; gather_grasps
    converts back to world per view (fixing the reference's leaked
    loop-variable extrinsic, data/regrad.py:364-366)."""
    T = np.eye(4)
    T[:3, 3] = [1.0, -2.0, 0.5]

    ds_w = RegradDataset(raw_cfg(raw_root), "train")
    ds_w.camera_info["extrinsic"][1] = T
    scene_w = ds_w[0]

    cfg_c = raw_cfg(raw_root)
    cfg_c["reference_frame"] = "camera"
    ds_c = RegradDataset(cfg_c, "train")
    ds_c.camera_info["extrinsic"][1] = T
    scene_c = ds_c[0]

    # view 1 cloud translated by -t (inv of pure translation)
    np.testing.assert_allclose(scene_c["views"][1]["pc_xyz"],
                               scene_w["views"][1]["pc_xyz"] - T[:3, 3],
                               atol=1e-5)
    # view 2 has identity extrinsic -> unchanged
    np.testing.assert_allclose(scene_c["views"][2]["pc_xyz"],
                               scene_w["views"][2]["pc_xyz"], atol=1e-5)
    # aggregate cloud stays world frame
    np.testing.assert_allclose(scene_c["aggr"]["pc_xyz"],
                               scene_w["aggr"]["pc_xyz"], atol=1e-5)
    # grasp poses moved to camera frame
    np.testing.assert_allclose(
        scene_c["grasps"][1]["grasp_poses"][:, :3, 3],
        scene_w["grasps"][1]["grasp_poses"][:, :3, 3] - T[:3, 3], atol=1e-5)
    # gather_grasps(view=0) converts back to world, per view
    g_c = ds_c.gather_grasps(scene_c, view=0)
    g_w = ds_w.gather_grasps(scene_w, view=0)
    np.testing.assert_allclose(g_c.poses, g_w.poses, atol=1e-5)
    np.testing.assert_allclose(g_c.scores, g_w.scores)


def test_export_scene_and_grasps(raw_root, tmp_path):
    """Dataset-level export viewers (file-output counterparts of the
    reference's visualize_scene/visualize_grasps, data/regrad.py:305-398)."""
    from dropclip_tpu import viz

    ds = RegradDataset(raw_cfg(raw_root), "train")
    path = ds.export_scene(0, str(tmp_path / "scene.pcd"), view=0, seg=True,
                           world_frame=True, camera_frames=True)
    xyz, colors = viz.load_pcd(path)
    # 400 cloud points + axis triads: 1 world + 9 camera frames, 96 pts each
    assert len(xyz) == 400 + 96 * 10
    assert colors is not None
    # per-view export, rgb colors
    ds.export_scene(0, str(tmp_path / "v1.pcd"), view=1)
    xyz1, _ = viz.load_pcd(str(tmp_path / "v1.pcd"))
    assert len(xyz1) == 200
    with pytest.raises(ValueError):
        ds.export_scene(0, str(tmp_path / "bad.pcd"), view=7)  # nviews=2

    written = ds.export_grasps(0, str(tmp_path / "g"), view=0,
                               score_thresh=0.1, max_grasps=5, sort=True,
                               gripper_type="marker")
    assert str(tmp_path / "g_cloud.pcd") in written
    obj = (tmp_path / "g_grasps.obj").read_text()
    n_groups = obj.count("o grasp_")
    assert 1 <= n_groups <= 5
    # object_only filter restricted to label 1 grasps
    w2 = ds.export_grasps(0, str(tmp_path / "g1"), view=1, score_thresh=0.0,
                          max_grasps=50, sort=True, object_only=1,
                          gripper_type="marker")
    assert (tmp_path / "g1_grasps.obj").exists() and len(w2) == 2


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
