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
