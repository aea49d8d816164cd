"""GroundingPipeline: single-view serve path (voxelize -> student ->
text grounding) on a tiny model."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

import jax
import jax.numpy as jnp

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.pipeline import GroundingPipeline


@pytest.fixture(scope="module")
def pipe():
    from dropclip_tpu.distill.engine import build_student_for, build_topology
    from dropclip_tpu.similarity import ClipSimilarity
    from dropclip_tpu.teachers.clip import build_clip

    cfg = CfgNode(dict(arch_3d="tiny", feat_dim=16, voxel_capacity=128,
                       voxel_size=0.05, use_color=True,
                       sparse_backend="bricks", brick_shape=[4, 4, 2],
                       sim_method="paired", sim_norm_thresh=0.6))
    model = build_student_for(cfg)
    coords = jnp.zeros((1, 128, 3), jnp.int32)
    mask = jnp.zeros((1, 128), bool).at[:, :16].set(True)
    feats = jnp.zeros((1, 128, 6), jnp.float32)
    topo = build_topology(cfg, coords, mask)
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=False)

    clip = build_clip("tiny-test")
    toks = jnp.zeros((1, clip.context_length), jnp.int32)
    px = jnp.zeros((1, clip.image_resolution, clip.image_resolution, 3))
    cvars = jax.jit(lambda p, t: clip.init(jax.random.PRNGKey(1), p, t)
                    )(px, toks)
    sim = ClipSimilarity(clip, cvars, threshold=0.6)
    return GroundingPipeline(cfg, variables["params"],
                             variables.get("batch_stats", {}), sim)


def test_featurize_shapes(rng, pipe):
    xyz = rng.randn(80, 3).astype(np.float32) * 0.3
    feats, vmask, vox = pipe.featurize(xyz, rng.rand(80, 3))
    assert feats.shape == (128, 16)
    assert 10 < vmask.sum() < 128
    # padded voxels carry zero features
    assert float(jnp.abs(feats[~vmask]).max()) == 0.0


def test_ground_end_to_end(rng, pipe):
    xyz = rng.randn(300, 3).astype(np.float32) * 0.3
    masks, sims = pipe.ground(xyz, rng.rand(300, 3),
                              ["the red mug", "a bowl"])
    assert masks.shape == (2, 300) and masks.dtype == bool
    assert sims.shape[0] == 2
    # voxel-level output too
    vmasks, _ = pipe.ground(xyz, None, ["thing"], per_point=False)
    assert vmasks.shape == (1, 128)
    # prompt cache reuse does not change results
    masks2, _ = pipe.ground(xyz, rng.rand(300, 3) * 0, ["the red mug"])
    assert masks2.shape == (1, 300)


def test_ground_batch_matches_per_scene(rng, pipe):
    """ground_batch == per-scene ground, with and without a device mesh
    (scenes shard over the data axis; B=3 pads to the axis size)."""
    from jax.sharding import Mesh

    clouds = [rng.randn(n, 3).astype(np.float32) * 0.3
              for n in (200, 150, 260)]
    rgbs = [rng.rand(len(c), 3) for c in clouds]
    queries = ["the red mug", "a bowl"]

    ref = [pipe.ground(c, r, queries) for c, r in zip(clouds, rgbs)]
    for mesh in (None, Mesh(np.array(jax.devices()[:2]), ("data",))):
        masks, sims = pipe.ground_batch(clouds, rgbs, queries, mesh=mesh)
        assert len(masks) == 3 and sims.shape[0] == 3
        for i, (m_ref, s_ref) in enumerate(ref):
            np.testing.assert_array_equal(masks[i], m_ref)
            np.testing.assert_allclose(np.asarray(sims[i]), s_ref,
                                       atol=1e-5)


def test_ground_batch_voxel_level(rng, pipe):
    clouds = [rng.randn(120, 3).astype(np.float32) * 0.3 for _ in range(2)]
    masks, sims = pipe.ground_batch(clouds, None, ["thing"],
                                    per_point=False)
    assert masks.shape == (2, 1, 128) and sims.shape == (2, 1, 128)


def test_pillar_engine_matches_bricks_pipeline(rng, pipe):
    """engine="pillars" (the volumetric inference engine, PERF.md
    "Pillar ENGINE") serves the SAME checkpoint through the pillar
    student: per-point grounding masks must match the brick pipeline,
    and a second scene must reuse the frozen static shapes."""
    # own pipelines on a CLONED cfg: the brick arm needs generous brick
    # capacities (scattered test clouds put ~1 voxel per brick and the
    # default M//8 heuristic drops some — 17 measured — which would make
    # the engines see DIFFERENT voxel sets), and GroundingPipeline
    # writes brick_capacities into cfg, so the shared fixture's cfg must
    # not be touched
    cfg = CfgNode(dict(pipe.cfg))
    pipe_b = GroundingPipeline(cfg, pipe.variables["params"],
                               pipe.variables["batch_stats"],
                               pipe.clip_sim,
                               brick_capacities=[128, 64, 64, 64, 64])
    pipe_p = GroundingPipeline(cfg, pipe.variables["params"],
                               pipe.variables["batch_stats"],
                               pipe.clip_sim, engine="pillars")
    queries = ["the red mug", "a bowl"]
    for n in (300, 240):  # second cloud exercises the frozen-shape replay
        xyz = (rng.randn(n, 3).astype(np.float32)
               * np.array([0.25, 0.25, 0.03], np.float32))
        rgb = rng.rand(n, 3)
        m_ref, s_ref = pipe_b.ground(xyz, rgb, queries)
        assert pipe_b.last_dropped == 0, pipe_b.last_dropped
        m_p, s_p = pipe_p.ground(xyz, rgb, queries)
        assert pipe_p.last_dropped == 0
        assert m_p.shape == m_ref.shape == (2, n)
        # engines agree to float noise; similarity thresholding may flip
        # points whose sim sits ON the threshold — compare sims tightly
        # and masks up to that boundary set
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref),
                                   atol=1e-3, rtol=1e-3)
        assert (m_p != m_ref).mean() < 0.02
    assert pipe_p._pillar_caps is not None and pipe_p._pillar_z0 is not None
