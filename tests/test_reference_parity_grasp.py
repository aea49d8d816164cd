"""Grasp-container parity vs the ACTUAL reference utils/grasp.py.

The module imports gripper_models/utils.viz (open3d/trimesh — stubbed,
never executed); the containers under test are pure numpy/cv2. The
reference's non-underscore filter methods reference an undefined
``Grasps`` name (a latent bug, SURVEY §2.2), so parity runs against the
in-place ``_filter*`` variants, which share the same selection math.
"""

import numpy as np
import pytest

from ref_oracle import ref_module

pytest.importorskip("cv2")


def _scene(rng, n=40):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.randn(n, 3)
    scores = rng.rand(n)
    labels = rng.randint(0, 5, size=n)
    return np.arange(n), poses, scores, labels


def test_scene_grasps_filters_parity(rng):
    ref_g = ref_module("utils.grasp")
    from dropclip_tpu.grasp.grasps import SceneGrasps

    idx, poses, scores, labels = _scene(rng)

    ref = ref_g.SceneGrasps(idx, poses, scores, labels)
    ref._filter_by_score(0.2)  # keeps scores > 3 * 0.2
    ours = SceneGrasps(idx, poses, scores, labels).filter_by_score(0.2)
    assert np.array_equal(ref._indices, ours.indices)
    np.testing.assert_allclose(ref._scores, ours.scores)

    ref = ref_g.SceneGrasps(idx, poses, scores, labels)
    ref._filter_by_labels([1, 3])
    ours = SceneGrasps(idx, poses, scores, labels).filter_by_labels([1, 3])
    assert np.array_equal(ref._indices, ours.indices)
    np.testing.assert_allclose(ref._poses, ours.poses)

    ref = ref_g.SceneGrasps(idx, poses, scores, labels)
    ref._select_topk(7)
    ours = SceneGrasps(idx, poses, scores, labels).select_topk(7)
    assert np.array_equal(ref._indices, ours.indices)
    np.testing.assert_allclose(ref._scores, ours.scores)

    # int obj_ids path
    ref = ref_g.SceneGrasps(idx, poses, scores, labels)
    ref._filter_by_labels(2)
    ours = SceneGrasps(idx, poses, scores, labels).filter_by_labels(2)
    assert np.array_equal(ref._indices, ours.indices)


def test_grasp2d_parity(rng):
    ref_g = ref_module("utils.grasp")
    from dropclip_tpu.grasp.grasps import Grasp2D

    for deg in (False, True):
        center = (int(rng.randint(20, 80)), int(rng.randint(20, 80)))
        angle = float(rng.rand() * (60 if deg else 1.0))
        width = float(5 + rng.rand() * 10)
        ref = ref_g.Grasp2D(center, angle, 0.9, width, deg=deg)
        ours = Grasp2D(center, angle, 0.9, width, deg=deg)
        assert np.allclose(ref.as_tuple(), ours.as_tuple())
        assert np.array_equal(ref.as_rect(), ours.as_rect())
