"""Grasp containers + language-guided ranking tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from dropclip_tpu.grasp import (SceneGrasps, create_gripper_marker,
                                rank_grasps_by_query)
from dropclip_tpu.grasp.gripper import save_obj


def make_grasps(rng, n=20):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.randn(n, 3)
    return SceneGrasps(np.arange(n), poses, rng.rand(n),
                       rng.randint(1, 4, n))


def test_scene_grasps_filters(rng):
    g = make_grasps(rng)
    hi = g.filter_by_score(0.2)  # keeps > 0.6 (3x thresh, reference :200)
    assert np.all(hi.scores > 0.6)
    only2 = g.filter_by_labels(2)
    assert np.all(only2.labels == 2)
    multi = g.filter_by_labels([1, 3])
    assert set(np.unique(multi.labels)) <= {1, 3}
    top = g.select_topk(5)
    assert len(top) == 5
    assert np.all(np.diff(top.scores) <= 0)
    samp = g.sample(7, rng=np.random.default_rng(0))
    assert len(samp) == 7


def test_gripper_mesh(tmp_path):
    from dropclip_tpu.grasp.gripper import make

    v, f = create_gripper_marker()
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert f.max() < len(v)
    g = make_grasps(np.random.RandomState(0), n=3)
    meshes = g.to_meshes()
    assert len(meshes) == 3
    # posed mesh is translated by the grasp position
    mv, _ = make("marker")
    assert np.allclose(meshes[0][0].mean(0) - mv.mean(0), g.poses[0, :3, 3],
                       atol=1e-6)
    save_obj(str(tmp_path / "g.obj"), v, f)
    assert (tmp_path / "g.obj").read_text().startswith("v ")


def test_gripper_factory(tmp_path):
    import pytest

    from dropclip_tpu.grasp.gripper import make

    for name in ("marker", "franka_panda", "robotiq_2f_140"):
        v, f = make(name)
        assert v.shape[1] == 3 and f.dtype == np.int32
        assert f.max() < len(v) and f.min() >= 0
        save_obj(str(tmp_path / f"{name}.obj"), v, f)
    # franka: the 90-deg about-y posing transform maps the hand's -z
    # approach axis onto x, 1.25x scale about the mesh center (reference
    # gripper_models/__init__.py:76-85) — the posed CAD hand extends
    # ~0.17 m along x
    v, _ = make("franka_panda")
    assert np.ptp(v[:, 0]) > 0.12
    with pytest.raises(ValueError):
        make("shadow_hand")


def test_rank_grasps_by_query(rng):
    """Grasps near the queried object's points must rank first."""
    n, c = 200, 16
    points = rng.randn(n, 3).astype(np.float32) * 0.02
    points[:100] += [1, 0, 0]   # object A cluster
    points[100:] += [-1, 0, 0]  # object B cluster
    pos_emb = np.zeros(c, np.float32)
    pos_emb[0] = 1.0
    feats = rng.randn(n, c).astype(np.float32) * 0.01
    feats[:100, 0] += 10.0  # object A matches the query
    g_pos = np.array([[1, 0, 0], [-1, 0, 0], [1, 0.02, 0]], np.float32)
    g_scores = np.array([0.1, 0.9, 0.2], np.float32)

    order, score = rank_grasps_by_query(
        jnp.asarray(points), jnp.asarray(feats), jnp.ones(n, bool),
        jnp.asarray(g_pos), jnp.asarray(g_scores), jnp.asarray(pos_emb),
        radius=0.2)
    order = np.asarray(order)
    # both object-A grasps outrank the high-quality object-B grasp
    assert set(order[:2]) == {0, 2}
    assert order[2] == 1


def test_gripper_cad_assets(monkeypatch, tmp_path):
    """Vendored CAD meshes (grasp/assets/) back the factory; the
    procedural approximations remain behind a fallback switch."""
    from dropclip_tpu.grasp import gripper

    assert gripper._have_assets("franka_hand.obj", "franka_finger.obj",
                                "robotiq_2f_140.obj")
    v, f = gripper.make("franka_panda")
    # real hand+2 fingers: hundreds of CAD vertices, not 24 box corners
    assert len(v) > 100 and f.max() < len(v) and f.min() >= 0
    rv, rf = gripper.make("robotiq_2f_140")
    assert len(rv) > 1000 and rf.max() < len(rv)
    # fingers straddle the grasp axis symmetrically (pre-pose y offsets)
    hv, _ = gripper._franka_mesh_assets()
    assert abs(hv[:, 1].max() + hv[:, 1].min()) < 0.02
    # procedural fallback still poses correctly
    monkeypatch.setattr(gripper, "_have_assets", lambda *n: False)
    pv, pf = gripper.make("franka_panda")
    assert len(pv) == 24 and pf.shape[1] == 3


def test_load_obj_formats(tmp_path):
    from dropclip_tpu.grasp.gripper import load_obj

    p = tmp_path / "m.obj"
    p.write_text("# c\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                 "f 1//1 2//1 3//1\nf 1 3 4 2\n")  # slash + quad fan
    v, f = load_obj(str(p))
    assert v.shape == (4, 3)
    assert f.tolist() == [[0, 1, 2], [0, 2, 3], [0, 3, 1]]
