"""Grounding/segmentation eval-loop tests: query planning (both dataset
formats + all negative modes), padded batched scorer == per-query loop,
perfect-prediction sanity, segmentation histograms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.distill.evaluate import (
    scene_query_plan,
    validate_grounding,
    validate_segmentation,
)
from dropclip_tpu.similarity import NEGATIVE_PROMPT_GENERIC, ClipSimilarity
from dropclip_tpu.teachers.clip import CLIP


@pytest.fixture(scope="module")
def clip_sim():
    model = CLIP(embed_dim=16, image_resolution=32, vision_layers=1,
                 vision_width=32, vision_patch_size=16, vision_heads=2,
                 context_length=77, vocab_size=49408, transformer_width=32,
                 transformer_heads=2, transformer_layers=1)
    variables = jax.jit(lambda p, t: model.init(jax.random.PRNGKey(0), p, t))(
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 77), jnp.int32))
    return ClipSimilarity(model, variables, threshold=0.5)


def test_scene_query_plan_blender_formats():
    q = {0: ["table"], 1: ["mug", "red mug"], 2: ["bowl"]}
    plan = scene_query_plan(q, "generic")
    assert len(plan) == 3  # table skipped, mug has 2 texts
    assert plan[0] == ("mug", [1], list(NEGATIVE_PROMPT_GENERIC))
    plan_s = scene_query_plan(q, "scene")
    assert plan_s[0][2] == ["bowl"]
    assert plan_s[2][2] == ["mug", "red mug"]
    plan_no = scene_query_plan(q, "no")
    assert plan_no[0][2] is None
    plan_all = scene_query_plan(q, "all", cls_list=["mug", "bowl", "can"])
    assert plan_all[0][2] == ["bowl", "can"]


def test_scene_query_plan_regrad_format():
    q = {"mug": [1, 3], "bowl": [2]}
    plan = scene_query_plan(q, "scene")
    assert plan[0] == ("mug", [1, 3], ["bowl"])


class StubSim:
    """encode_text stub with orthogonal one-hot embeddings per unique text
    — lets 'perfect student' tests have unambiguous grounding."""

    def __init__(self, dim=16):
        self.dim = dim
        self._dirs = {}

    def encode_text(self, texts):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            if t not in self._dirs:
                self._dirs[t] = len(self._dirs) % self.dim
            out[i, self._dirs[t]] = 1.0
        return jnp.asarray(out)


def _fake_batches(sim, b=2, m=64, n_batches=2, seed=0):
    """Batches whose targets equal each object's own query text embedding —
    a perfect student should ground perfectly."""
    rng = np.random.RandomState(seed)
    texts = {1: "mug", 2: "bowl", 0: "table"}
    embs = {k: np.asarray(sim.encode_text([t])[0]) for k, t in texts.items()}
    batches = []
    for _ in range(n_batches):
        labels = rng.randint(0, 3, size=(b, m)).astype(np.int32)
        mask = np.ones((b, m), bool)
        mask[:, -5:] = False
        out = rng.randn(b, m, 16).astype(np.float32) * 0.001
        for k, e in embs.items():
            out[labels == k] += e * 10
        batches.append({
            "targets": out, "mask": mask, "labels": labels,
            "queries": [{1: ["mug"], 2: ["bowl"]}] * b,
        })
    return batches


def test_validate_grounding_perfect_student():
    # threshold 0.6: paired softmax sits at ~0.5 on points matching neither
    # the positive nor any negative (table), ~1 on the object, ~0 on negs.
    cfg = CfgNode({"sim_method": "paired", "sim_norm_thresh": 0.6,
                   "sim_negatives": "scene"})
    sim = StubSim()
    batches = _fake_batches(sim)

    def forward(batch):
        return jnp.asarray(batch["targets"]), 0.0

    res = validate_grounding(batches, forward, sim, cfg)
    assert res["mIoU"] > 95.0, res
    assert res["Pr@50"] > 95.0, res


def test_validate_grounding_compat_flag(clip_sim):
    cfg = CfgNode({"sim_method": "paired", "sim_norm_thresh": 0.5,
                   "sim_negatives": "generic"})
    batches = _fake_batches(clip_sim)

    def forward(batch):
        return jnp.asarray(batch["targets"]), 0.1

    full = validate_grounding(batches, forward, clip_sim, cfg)
    last = validate_grounding(batches, forward, clip_sim, cfg,
                              compat_last_scene_only=True)
    assert full["DistilLoss"] == pytest.approx(0.1)
    assert set(full) == set(last)


def test_validate_segmentation_perfect(clip_sim):
    rng = np.random.RandomState(0)
    cls_texts = ["mug", "bowl", "can"]
    cls_embs = clip_sim.encode_text(cls_texts)  # normalized ok for argmax
    b, m = 2, 48
    labels_cls = rng.randint(0, 3, size=(b, m)).astype(np.int32)
    labels = rng.randint(1, 3, size=(b, m)).astype(np.int32)
    mask = np.ones((b, m), bool)
    out = np.asarray(cls_embs)[labels_cls] * 5.0
    labels_cls[:, :4] = 255  # ignored region
    batches = [{
        "targets": out, "mask": mask, "labels": labels,
        "labels_cls": labels_cls,
    }]
    cfg = CfgNode({"n_classes": 3, "ignore_label": 255})

    def forward(batch):
        return jnp.asarray(batch["targets"]), 0.0

    res = validate_segmentation(batches, forward, jnp.asarray(cls_embs), cfg)
    assert res["mIoU"] > 0.99
    assert res["allAcc"] > 0.99
