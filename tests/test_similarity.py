"""Tests of the grounding head vs a torch transliteration of the reference
formulas (models/similarity.py:28-101), plus padded-mask semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.similarity import (  # noqa: E402
    l2_normalize,
    paired_softmax_probs,
    predict_from_embeddings,
)


def torch_reference_predict(vis, pos, neg, method, threshold, temp=0.1):
    """Direct transliteration of reference predict() on precomputed
    normalized text embeddings."""
    vis = torch.as_tensor(vis)
    vis = vis / vis.norm(dim=-1, keepdim=True)
    text = torch.cat([torch.as_tensor(pos)[None], torch.as_tensor(neg)], 0)
    raw = vis @ text.T
    if method == "paired":
        pos_s, neg_s = raw[..., :1], raw[..., 1:]
        paired = torch.cat([pos_s.broadcast_to(neg_s.shape), neg_s], -1)
        probs = (paired / temp).softmax(-1)[..., :1]
        torch.nan_to_num_(probs, nan=0.0)
        sims = probs.min(dim=-1, keepdim=True)[0].squeeze()
        if sims.max() != sims.min():
            sims_norm = (sims - sims.min()) / (sims.max() - sims.min())
        else:
            sims_norm = sims / sims.max()
        return (sims_norm > threshold).numpy(), sims_norm.float().numpy()
    sims = raw.squeeze()
    sims_dif = sims[:, 0] - sims[:, 1:].mean(-1)
    if sims.max() != sims.min():
        sims_norm = (sims_dif - sims_dif.min()) / (sims_dif.max() - sims_dif.min())
    else:
        sims_norm = sims_dif / sims_dif.max()
    pred = (torch.max(sims, 1)[1] == 0).numpy()
    return pred, sims_norm.float().numpy()


@pytest.fixture
def embs(rng):
    vis = rng.randn(50, 16).astype(np.float32)
    pos = rng.randn(16).astype(np.float32)
    neg = rng.randn(4, 16).astype(np.float32)
    pos /= np.linalg.norm(pos)
    neg /= np.linalg.norm(neg, axis=-1, keepdims=True)
    return vis, pos, neg


@pytest.mark.parametrize("method", ["paired", "argmax"])
def test_predict_matches_reference(embs, method):
    vis, pos, neg = embs
    want_pred, want_sims = torch_reference_predict(vis, pos, neg, method, 0.7)
    got_pred, got_sims = predict_from_embeddings(
        jnp.asarray(vis), jnp.asarray(pos), jnp.asarray(neg), method=method,
        threshold=0.7)
    assert np.max(np.abs(np.asarray(got_sims) - want_sims)) < 1e-5
    assert np.array_equal(np.asarray(got_pred), want_pred)


def test_no_negatives_path(embs):
    vis, pos, _ = embs
    pred, sims = predict_from_embeddings(jnp.asarray(vis), jnp.asarray(pos),
                                         None, threshold=0.5)
    visn = vis / np.linalg.norm(vis, axis=-1, keepdims=True)
    raw = visn @ pos
    want = (raw - raw.min()) / (raw.max() - raw.min())
    assert np.max(np.abs(np.asarray(sims) - want)) < 1e-5
    assert np.array_equal(np.asarray(pred), want > 0.5)


def test_mask_excludes_padding(embs):
    """Padded rows must not influence the min-max normalization and must
    never be predicted positive."""
    vis, pos, neg = embs
    mask = np.ones(50, bool)
    mask[40:] = False
    vis_pad = vis.copy()
    vis_pad[40:] = 100.0  # garbage padding
    pred_a, sims_a = predict_from_embeddings(
        jnp.asarray(vis_pad), jnp.asarray(pos), jnp.asarray(neg),
        mask=jnp.asarray(mask), threshold=0.7)
    pred_b, sims_b = predict_from_embeddings(
        jnp.asarray(vis[:40]), jnp.asarray(pos), jnp.asarray(neg), threshold=0.7)
    assert np.max(np.abs(np.asarray(sims_a)[:40] - np.asarray(sims_b))) < 1e-5
    assert not np.any(np.asarray(pred_a)[40:])


def test_paired_probs_in_unit_interval(embs):
    vis, pos, neg = embs
    visn = np.asarray(l2_normalize(jnp.asarray(vis)))
    p = np.asarray(paired_softmax_probs(jnp.asarray(visn), jnp.asarray(pos),
                                        jnp.asarray(neg)))
    assert p.shape == (50,)
    assert np.all((p >= 0) & (p <= 1))


@pytest.mark.slow
def test_wrapper_with_tiny_clip(rng):
    """End-to-end: prompts -> tiny CLIP text encoder -> predict."""
    import jax

    from dropclip_tpu.similarity import ClipSimilarity
    from dropclip_tpu.teachers.clip import CLIP

    model = CLIP(embed_dim=16, image_resolution=32, vision_layers=1,
                 vision_width=32, vision_patch_size=16, vision_heads=2,
                 context_length=77, vocab_size=49408, transformer_width=32,
                 transformer_heads=2, transformer_layers=1)
    toks = jnp.zeros((1, 77), jnp.int32)
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), px, toks)
    sim = ClipSimilarity(model, variables, threshold=0.7)
    vis = jnp.asarray(rng.randn(30, 16).astype(np.float32))
    pred, sims = sim.predict(vis, "a red mug", qneg=[])
    assert pred.shape == sims.shape == (30,)
    assert bool(jnp.all(jnp.isfinite(sims)))
    # cache works
    assert len(sim._cache) == 2
    sim.predict(vis, "a red mug", qneg=[])
    assert len(sim._cache) == 2
