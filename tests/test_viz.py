"""Viz utility tests: palette, PCA colormap, pcd round trip."""

import os

import numpy as np

from dropclip_tpu.viz import (PALETTE, apply_pca, label_colors, load_pcd,
                              save_pcd, similarity_colors)


def test_palette_distinct():
    assert PALETTE.shape == (85, 3)
    assert PALETTE.min() >= 0 and PALETTE.max() <= 1
    # all colors pairwise distinct
    d = np.linalg.norm(PALETTE[:, None] - PALETTE[None, :], axis=-1)
    d += np.eye(len(PALETTE))
    assert d.min() > 0.05


def test_label_colors(rng):
    labs = rng.randint(0, 200, 50)
    c = label_colors(labs)
    assert c.shape == (50, 3)
    assert np.allclose(c[labs == 0], PALETTE[0])


def test_apply_pca(rng):
    f = rng.randn(100, 16).astype(np.float32)
    f[:50, 0] += 10  # strong first component
    c = apply_pca(f)
    assert c.shape == (100, 3)
    assert c.min() >= 0 and c.max() <= 1.0 + 1e-6
    # the dominant direction separates the two halves in channel 0
    assert abs(c[:50, 0].mean() - c[50:, 0].mean()) > 0.5
    # masked rows don't affect the projection and come out zero
    mask = np.ones(100, bool)
    mask[90:] = False
    f2 = f.copy()
    f2[90:] = 1e6
    c2 = apply_pca(f2, mask=mask)
    assert np.allclose(c2[:90], apply_pca(f[:90]), atol=1e-5)
    assert np.allclose(c2[90:], 0)


def test_similarity_colors():
    c = similarity_colors(np.array([0.0, 0.5, 1.0]))
    assert np.allclose(c[0], [0, 0, 1])  # cold
    assert np.allclose(c[2], [1, 0, 0])  # hot


def test_pcd_roundtrip(tmp_path, rng):
    xyz = rng.randn(30, 3).astype(np.float32)
    col = rng.rand(30, 3).astype(np.float32)
    p = str(tmp_path / "x.pcd")
    save_pcd(p, xyz, col)
    xyz2, col2 = load_pcd(p)
    assert np.allclose(xyz, xyz2, atol=1e-4)
    assert np.max(np.abs(col - col2)) < 1 / 255 + 1e-6
    save_pcd(p, xyz, None)
    xyz3, col3 = load_pcd(p)
    assert col3 is None and np.allclose(xyz, xyz3, atol=1e-4)


def test_export_similarity_heatmap(tmp_path, rng):
    from dropclip_tpu.viz import export_similarity_heatmap, load_pcd

    xyz = rng.randn(50, 3).astype(np.float32)
    sims = rng.rand(50).astype(np.float32)
    p = str(tmp_path / "heat.pcd")
    export_similarity_heatmap(p, xyz, sims, threshold=0.5)
    back_xyz, back_rgb = load_pcd(p)
    assert back_xyz.shape == (50, 3)
    assert back_rgb is not None and len(back_rgb) == 50
    # the threshold cuts on RAW similarity (absolute scale, same as
    # sim_norm_thresh), not the minmax-normalized colors: a query
    # matching nothing must dim EVERY point, not paint the relative
    # best quarter hot
    export_similarity_heatmap(p, xyz, np.full(50, 0.1, np.float32)
                              + 1e-4 * sims, threshold=0.5)
    _, dim_rgb = load_pcd(p)
    assert np.allclose(dim_rgb, 0.35, atol=1e-3)


def test_export_grasp_scene(tmp_path, rng):
    """Language-ranked grasp scene -> cloud .pcd + posed-gripper .obj with
    one named group per ranked grasp (file-output counterpart of reference
    utils/viz.py:426-492)."""
    from dropclip_tpu.grasp.grasps import SceneGrasps
    from dropclip_tpu.viz import export_grasp_scene

    xyz = rng.randn(40, 3).astype(np.float32)
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, 3] = rng.randn(5, 3)
    g = SceneGrasps(indices=np.arange(5), poses=poses,
                    scores=np.array([0.1, 0.9, 0.5, 0.3, 0.7]),
                    labels=np.ones(5, np.int32))
    paths = export_grasp_scene(str(tmp_path / "scene"), xyz, None, g,
                               top_k=3, gripper_type="franka_panda")
    assert all(os.path.exists(p) for p in paths)
    obj = open(paths[1]).read()
    assert obj.count("o grasp_") == 3
    # best grasp (score 0.9, pose row 1) comes first
    first_v = [l for l in obj.splitlines() if l.startswith("v ")][0]
    assert "o grasp_000" in obj.split(first_v)[0]
    nverts = sum(1 for l in obj.splitlines() if l.startswith("v "))
    nfaces = sum(1 for l in obj.splitlines() if l.startswith("f "))
    assert nverts > 0 and nfaces > 0
    # face indices stay in range across concatenated groups
    idxs = [int(t) for l in obj.splitlines() if l.startswith("f ")
            for t in l.split()[1:]]
    assert max(idxs) == nverts


def test_draw_2d_grasps_in_image():
    from dropclip_tpu.viz import draw_2d_grasps_in_image

    img = np.zeros((64, 64, 3), np.uint8)
    rect = np.array([[10, 10], [40, 10], [40, 30], [10, 30]], np.float32)
    out = draw_2d_grasps_in_image(img, [rect])
    assert img.sum() == 0  # input untouched
    # finger edges (A-B, D-C) red, jaw edges (B-C, A-D) blue
    assert (out[10, 25] == (255, 0, 0)).all()
    assert (out[30, 25] == (255, 0, 0)).all()
    assert (out[20, 40] == (0, 0, 255)).all()
    assert (out[20, 10] == (0, 0, 255)).all()


def test_export_multiview_similarity(tmp_path, rng):
    from dropclip_tpu.viz import (export_multiview_similarity,
                                  export_multiview_similarity_obj_prior)

    images = rng.randint(0, 255, (2, 16, 20, 3)).astype(np.uint8)
    sims = rng.rand(2, 16, 20).astype(np.float32)
    p = export_multiview_similarity(str(tmp_path / "mv.png"), images, sims,
                                    "a red mug", threshold=0.9)
    from PIL import Image

    arr = np.asarray(Image.open(p))
    assert arr.shape[1] == 2 * 20 and arr.shape[0] > 2 * 16  # grid + title
    # hot pixels painted red in the top row
    hot = np.unravel_index(sims[0].argmax(), sims[0].shape)
    assert (arr[24 + hot[0], hot[1]][:3] == (255, 0, 0)).all()

    seg = np.zeros((2, 16, 20), np.int32)
    seg[:, 2:8, 2:8] = 1
    seg[:, 9:14, 9:18] = 2
    obj_sims = np.array([[0.1, 0.9], [0.8, 0.2]], np.float32)
    p2 = export_multiview_similarity_obj_prior(
        str(tmp_path / "mvo.png"), images, seg, [[1, 2], [1, 2]], obj_sims,
        "a red mug")
    arr2 = np.asarray(Image.open(p2))
    # view 0 argmax object = 2 -> its mask painted red
    assert (arr2[24 + 10, 10][:3] == (255, 0, 0)).all()
    assert (arr2[24 + 3, 3][:3] != (255, 0, 0)).any()


def test_export_feat_scene_and_clip_pred(tmp_path, rng):
    from dropclip_tpu.viz import export_clip_pred, export_feat_scene, load_pcd

    n = 30
    xyz = rng.randn(n, 3).astype(np.float32)
    feat = rng.randn(n, 8).astype(np.float32)
    p = export_feat_scene(str(tmp_path / "fs.pcd"), xyz, rng.rand(n, 3),
                          rng.randint(0, 5, n), feat,
                          patch_feat=feat, trans_factor=10.0)
    back, cols = load_pcd(p)
    assert len(back) == 4 * n and cols is not None
    # panels translated along x by 10
    assert np.allclose(back[n:2 * n, 0] - back[:n, 0], 10.0, atol=1e-4)

    pred = rng.rand(n) > 0.5
    p2 = export_clip_pred(str(tmp_path / "cp.pcd"), xyz, pred,
                          rng.rand(n).astype(np.float32),
                          background=np.full((n, 3), 0.5, np.float32),
                          gt=(rng.rand(n) > 0.5), trans_factor=10.0)
    back2, cols2 = load_pcd(p2)
    assert len(back2) == 3 * n
    # predicted points red in the last panel
    last = cols2[2 * n:]
    assert np.allclose(last[pred], [1, 0, 0], atol=1 / 255 + 1e-6)


def test_export_boxes(tmp_path):
    from dropclip_tpu.viz import export_boxes, load_pcd

    boxes = np.array([[[0, 0, 0], [1, 1, 1]], [[2, 2, 2], [3, 4, 5]]],
                     np.float32)
    p = export_boxes(str(tmp_path / "boxes.pcd"), boxes, n=8)
    xyz, cols = load_pcd(p)
    assert len(xyz) == 2 * 12 * 8 and cols is not None
    # first box's points stay within its corners
    b0 = xyz[:96]
    assert b0.min() >= -1e-5 and b0.max() <= 1 + 1e-5


def test_coord_frame_points():
    from dropclip_tpu.viz import coord_frame_points

    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    xyz, cols = coord_frame_points(scale=0.5, transform=T, n=16)
    assert xyz.shape == (48, 3) and cols.shape == (48, 3)
    # x-axis points run from origin to origin + 0.5*x, colored red
    assert np.allclose(xyz[0], [1, 2, 3], atol=1e-6)
    assert np.allclose(xyz[15], [1.5, 2, 3], atol=1e-6)
    assert np.allclose(cols[0], [1, 0, 0])
    assert np.allclose(cols[-1], [0, 0, 1])


def test_draw_relation_boxes_on_image():
    from dropclip_tpu.viz import draw_relation_boxes_on_image

    img = np.zeros((32, 32, 3), np.uint8)
    boxes = {1: (2, 2, 10, 10), 2: (15, 15, 25, 28)}
    out = draw_relation_boxes_on_image(img, boxes, source=1, targets=[2])
    assert (out[2, 6] == (0, 255, 0)).all()    # source edge green
    assert (out[15, 20] == (255, 0, 0)).all()  # target edge red
    assert img.sum() == 0
