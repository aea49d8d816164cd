"""Raw MV-TOD reader + full Blender ingest e2e on a synthetic raw tree
written in the exact reference on-disk layout."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

pytest.importorskip("cv2")

from dropclip_tpu.data.blender import BlenderDataset
from dropclip_tpu.data.synthetic import write_fake_raw_blender


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw_blender"))
    write_fake_raw_blender(root, n_scenes=1, n_objects=2, n_views=3)
    return root


def test_reader(raw_root):
    ds = BlenderDataset(raw_root, split="train")
    assert len(ds.scene_ids) == 1
    scene = ds[0]
    assert len(scene["views"]) == 3
    v0 = scene["views"]["0000"]
    assert v0["rgb"].shape == (48, 64, 3)
    assert v0["depth"].dtype == np.float32
    assert len(v0["annos"]) >= 1
    cls_name, mask, hex_id = v0["annos"][0]
    assert mask.dtype == np.uint8 and mask.shape == (48, 64)
    # instance ids assigned 1..K, hex mapping consistent
    assert scene["col_to_ins"]["#000000"] == 0
    assert set(scene["objects_info"]) == {0, 1, 2}
    # intrinsics from base_scale=10 (reference blender.py:180-187)
    assert abs(scene["camera_intrinsic"]["fx"] - 444.44444444) < 1e-6
    segs, ids = BlenderDataset.obtain_seg_info(scene)
    assert segs[0].shape == (48, 64)
    assert set(np.unique(segs[0])) <= {0, 1, 2}


def test_blender_ingest_e2e(raw_root, tmp_path):
    """run_blender: raw tree -> teacher -> fusion -> processed h5 ->
    MVTODDataset item."""
    import sys

    from dropclip_tpu.tools import preprocess_data as pp

    out = str(tmp_path / "processed")
    argv = ["preprocess_data", "-ds", "Blender", "-r", raw_root, "-c", out,
            "--clip-model", "tiny-test", "--voxel-size", "0.002"]
    old = sys.argv
    sys.argv = argv
    try:
        pp.main()
    finally:
        sys.argv = old

    path = os.path.join(out, "train", "000000", "000000.h5py")
    assert os.path.isfile(path)
    from dropclip_tpu.data.scene_io import read_scene

    s = read_scene(path)
    assert s.obj_feats.shape[0] == 3  # table + 2 objects
    assert s.xyz.shape[0] == s.vis_mask.shape[1] > 0
    assert not np.any(np.isnan(s.obj_feats))

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.data.dataset_blender import MVTODDataset

    cfg = CfgNode(dict(root_dir=out, voxel_size=0.002, voxel_capacity=512,
                       use_full_pc=False, use_k_views=2, use_color=True,
                       use_augmentation=False, eval_scenario="cls",
                       manual_seed=42))
    ds = MVTODDataset(cfg, "train")
    item = ds[0]
    assert item["mask"].sum() > 10
    assert item["targets"].shape[-1] == 16


def test_process_scene_staged_matches_unstaged(tmp_path):
    """stage_scene's wire-dtype shrink (f16 depth, u8 seg) must not move
    outputs: staged and unstaged ingest of the same scene agree."""
    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.data.scene_io import read_scene
    from dropclip_tpu.data.synthetic import make_raw_scene
    from dropclip_tpu.tools.preprocess_data import (build_extractor,
                                                    process_scene,
                                                    stage_scene)

    args = CfgNode(dict(clip_model="tiny-test", clip_checkpoint=None,
                        visual_prompt="crop-mask", crop_num_levels=1,
                        crop_expansion_ratio=0.15, batch_size=8))
    ex = build_extractor(args)
    raw = make_raw_scene(np.random.default_rng(3), n_objects=2, n_views=3)
    kw = dict(images=raw["images"], depths=raw["depths"], segs=raw["segs"],
              poses=raw["poses"], K=raw["K"], obj_info=raw["objects_info"],
              extractor=ex, voxel_size=0.01, cloud_capacity=2048)
    a = str(tmp_path / "a.h5py")
    b = str(tmp_path / "b.h5py")
    process_scene(out_path=a, **kw)
    staged = stage_scene(raw["images"], raw["depths"], raw["segs"],
                         raw["poses"], raw["K"])
    process_scene(out_path=b, staged=staged, **kw)
    sa, sb = read_scene(a), read_scene(b)
    assert sa.xyz.shape == sb.xyz.shape
    np.testing.assert_allclose(sa.xyz, sb.xyz, atol=1e-5)
    np.testing.assert_allclose(sa.obj_feats, sb.obj_feats, atol=1e-5)
    np.testing.assert_array_equal(sa.label, sb.label)


def test_load_grasps_and_grasp_root(raw_root, tmp_path):
    """ACRONYM grasp loading wired live (the reference defines load_grasps
    but its call site is commented out, data/blender.py:100-121, 205-221):
    h5 + json schemas round-trip, and objects_info carries grasps when
    grasp_root is set."""
    import h5py
    import json

    g = 6
    T = np.tile(np.eye(4, dtype=np.float32), (g, 1, 1))
    T[:, :3, 3] = np.arange(g * 3, dtype=np.float32).reshape(g, 3) * 0.01
    ok = np.array([1, 0, 1, 1, 0, 1])
    groot = tmp_path / "grasps"
    groot.mkdir()
    # model ids for the fixture's two objects (path.split('/')[-2])
    for mid in ("bowl", "bottle"):
        with h5py.File(groot / f"shapenet_{mid}_abc.h5", "w") as f:
            f.create_dataset("grasps/transforms", data=T)
            f.create_dataset("grasps/qualities/flex/object_in_gripper",
                             data=ok)
            f.create_dataset("object/scale", data=0.5)

    # static loader: h5 and json agree
    t1, s1, sc1 = BlenderDataset.load_grasps(
        str(groot / "shapenet_bowl_abc.h5"))
    jpath = tmp_path / "g.json"
    json.dump({"transforms": T.tolist(),
               "quality_flex_object_in_gripper": ok.tolist(),
               "object_scale": 0.5}, open(jpath, "w"))
    t2, s2, sc2 = BlenderDataset.load_grasps(str(jpath))
    np.testing.assert_allclose(t1, t2, atol=1e-6)
    np.testing.assert_array_equal(s1, s2)
    assert sc1 == sc2 == 0.5

    ds = BlenderDataset(raw_root, split="train", grasp_root=str(groot))
    assert ds.load_object_grasps("bowl")[0].shape == (g, 4, 4)
    assert ds.load_object_grasps("nope") is None
    scene = ds[0]
    infos = scene["objects_info"]
    with_grasps = [o for o in infos.values() if "grasps" in o]
    assert len(with_grasps) == 2
    assert with_grasps[0]["grasps"].shape == (g, 4, 4)
    assert with_grasps[0]["grasp_scale"] == 0.5
    # without grasp_root nothing is attached (back-compat)
    ds2 = BlenderDataset(raw_root, split="train")
    assert all("grasps" not in o for o in ds2[0]["objects_info"].values())
