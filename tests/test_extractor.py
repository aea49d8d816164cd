"""Extractor framework tests with a tiny random CLIP: shapes, present
masking, prompt averaging, batching invariance."""

import numpy as np
import pytest

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.teachers.clip import CLIP  # noqa: E402
from dropclip_tpu.teachers.extractor import ClipExtractor  # noqa: E402

H, W = 48, 64


@pytest.fixture(scope="module")
def tiny():
    model = CLIP(embed_dim=24, image_resolution=32, vision_layers=2,
                 vision_width=64, vision_patch_size=16, vision_heads=4,
                 context_length=77, vocab_size=49408, transformer_width=32,
                 transformer_heads=4, transformer_layers=2)
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    variables = jax.jit(lambda p, t: model.init(jax.random.PRNGKey(0), p, t))(
        px, toks)
    return model, variables


def scene(rng, v=2):
    imgs = (rng.rand(v, H, W, 3) * 255).astype(np.uint8)
    segs = np.zeros((v, H, W), np.int32)
    segs[:, 5:20, 10:30] = 1
    segs[0, 25:40, 35:60] = 2  # object 2 only in view 0
    return imgs, segs


def test_cls_extract_shapes(rng, tiny):
    model, variables = tiny
    ex = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32),
                       batch_size=2)
    imgs, _ = scene(rng, v=3)
    out = ex.extract(imgs)
    assert out.shape == (3, 24)
    # batching must not change results
    ex1 = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32),
                        batch_size=1)
    out1 = ex1.extract(imgs)
    assert np.allclose(np.asarray(out), np.asarray(out1), atol=1e-5)


def test_patch_extract_shapes(rng, tiny):
    model, variables = tiny
    ex = ClipExtractor(model, variables, mode="patch", img_resize=(32, 48))
    imgs, _ = scene(rng)
    out = ex.extract(imgs)
    assert out.shape == (2, 2, 3, 24)  # 32/16 x 48/16 grid


def test_obj_prior_present_masking(rng, tiny):
    model, variables = tiny
    ex = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32),
                       visual_prompt=("crop-mask",), crop_num_levels=1)
    imgs, segs = scene(rng)
    feats, present = ex.extract_obj_prior(imgs, segs, obj_ids=[1, 2, 3])
    assert feats.shape == (2, 3, 24)
    assert np.array_equal(np.asarray(present),
                          [[True, True, False], [True, False, False]])
    # absent rows zeroed
    assert np.allclose(np.asarray(feats)[1, 1], 0.0)
    assert np.allclose(np.asarray(feats)[:, 2], 0.0)
    assert not np.allclose(np.asarray(feats)[0, 0], 0.0)


def test_obj_prior_prompt_average(rng, tiny):
    """L>1 prompt kinds average; single kind equals its own embedding."""
    model, variables = tiny
    imgs, segs = scene(rng, v=1)
    ex1 = ClipExtractor(model, variables, img_resize=(32, 32),
                        visual_prompt=("mask-out",))
    ex2 = ClipExtractor(model, variables, img_resize=(32, 32),
                        visual_prompt=("mask-out", "mask-out"))
    f1, _ = ex1.extract_obj_prior(imgs, segs, obj_ids=[1])
    f2, _ = ex2.extract_obj_prior(imgs, segs, obj_ids=[1])
    assert np.allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_encode_text(tiny):
    model, variables = tiny
    ex = ClipExtractor(model, variables, img_resize=(32, 32))
    emb = ex.encode_text(["a red mug", "a spoon"])
    assert emb.shape == (2, 24)
    assert bool(jnp.all(jnp.isfinite(emb)))


def test_mode_validation(tiny):
    model, variables = tiny
    with pytest.raises(ValueError):
        ClipExtractor(model, variables, mode="nope", img_resize=(32, 32))


def test_tiled_extraction(tiny, rng):
    """Legacy hi-res tiled path (reference
    tools/extract_multiview_features.py:191-232): center-crop -> tile grid
    -> per-tile cls features -> (g, g, C) map; a single whole-crop tile
    equals plain cls extraction of the crop."""
    from dropclip_tpu.tools.clip_extract import extract_tiled, patchify_image

    model, variables = tiny
    img = (rng.rand(72, 96, 3) * 255).astype(np.uint8)

    tiles, crop = patchify_image(img, crop_size=64, tile=16)
    assert tiles.shape == (16, 16, 16, 3)
    assert crop.shape == (64, 64, 3)
    # tiles reassemble the crop exactly
    g = 4
    re = tiles.reshape(g, g, 16, 16, 3).swapaxes(1, 2).reshape(64, 64, 3)
    assert np.array_equal(re, crop)

    ex = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32))
    fmap = extract_tiled(ex, img, crop_size=64, tile=16, batch_size=8)
    assert fmap.shape == (4, 4, 24)
    assert np.isfinite(fmap).all()

    one = extract_tiled(ex, img, crop_size=64, tile=64)
    whole = np.asarray(ex.extract(crop[None]))[0]
    assert np.allclose(one[0, 0], whole, atol=1e-5)


@pytest.mark.slow
def test_rn_tower_extractor_smoke(rng):
    """The extractor framework over the RN tower (tiny-test-rn): patch
    mode at a non-square resize (forward_v + interpolated attnpool
    pos-embed), and obj-prior cls mode at the native square grid."""
    from dropclip_tpu.teachers.clip import build_clip

    model = build_clip("tiny-test-rn", use_flash=False)
    r = model.image_resolution
    px = jnp.zeros((1, r, r, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    variables = jax.jit(lambda p, t: model.init(jax.random.PRNGKey(0), p, t))(
        px, toks)

    imgs, segs = scene(rng)
    ex = ClipExtractor(model, variables, mode="patch", img_resize=(64, 96),
                       batch_size=2)
    pf = np.asarray(ex.extract(imgs))
    assert pf.shape == (2, 2, 3, 16)  # 64/32 x 96/32 grid
    assert np.isfinite(pf).all()

    ex_cls = ClipExtractor(model, variables, mode="cls", img_resize=(r, r),
                           batch_size=2)
    feats, present = ex_cls.extract_obj_prior(imgs, segs, [1, 2])
    assert np.asarray(feats).shape == (2, 2, 16)
    assert np.isfinite(np.asarray(feats)).all()


def test_obj_prior_packed_multichunk(rng, tiny, monkeypatch):
    """>96 present pairs must span multiple fixed-size chunks and still
    scatter back to the right (view, object) slots — compare against the
    padded path at 13 views x 8 objects = 104 pairs."""
    model, variables = tiny
    ex = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32),
                       visual_prompt=("crop-mask",), crop_num_levels=1)
    v, k = 13, 8
    imgs = (rng.rand(v, H, W, 3) * 255).astype(np.uint8)
    segs = np.zeros((v, H, W), np.int32)
    for o in range(1, k + 1):  # all 8 objects present in every view
        segs[:, 5 * o - 4: 5 * o, 8: 56] = o
    obj_ids = list(range(1, k + 1))
    monkeypatch.setenv("DROPCLIP_PACKED_PROMPTS", "0")
    f_ref, p_ref = ex.extract_obj_prior(imgs, segs, obj_ids=obj_ids)
    monkeypatch.setenv("DROPCLIP_PACKED_PROMPTS", "1")
    f_new, p_new = ex.extract_obj_prior(imgs, segs, obj_ids=obj_ids)
    assert np.asarray(p_new).all() and np.asarray(p_ref).all()
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               atol=1e-6)


def test_obj_prior_packed_empty_scene(rng, tiny):
    """No object present anywhere: all-zero features, all-False present
    (the packed path pads an empty pair list to one full drop-chunk)."""
    model, variables = tiny
    ex = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32),
                       visual_prompt=("crop-mask",), crop_num_levels=1)
    imgs = (rng.rand(2, H, W, 3) * 255).astype(np.uint8)
    segs = np.zeros((2, H, W), np.int32)
    feats, present = ex.extract_obj_prior(imgs, segs, obj_ids=[1, 2, 3])
    assert not np.asarray(present).any()
    assert np.asarray(feats).shape == (2, 3, 24)
    assert (np.asarray(feats) == 0).all()


def test_obj_prior_packed_matches_viewchunk(rng, tiny, monkeypatch):
    """The packed present-pair path (default) must reproduce the padded
    view-chunk path exactly: same prompt pipeline per (view, object),
    per-row towers, only absent pairs skipped instead of masked."""
    model, variables = tiny
    ex = ClipExtractor(model, variables, mode="cls", img_resize=(32, 32),
                       visual_prompt=("crop-mask",), crop_num_levels=1)
    imgs, segs = scene(rng)
    monkeypatch.setenv("DROPCLIP_PACKED_PROMPTS", "0")
    f_ref, p_ref = ex.extract_obj_prior(imgs, segs, obj_ids=[1, 2, 3])
    monkeypatch.setenv("DROPCLIP_PACKED_PROMPTS", "1")
    f_new, p_new = ex.extract_obj_prior(imgs, segs, obj_ids=[1, 2, 3])
    assert np.array_equal(np.asarray(p_ref), np.asarray(p_new))
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               atol=1e-6)
