"""Augmentation behavior tests (bounds, determinism, HSV parity with
colorsys, blob/flip/elastic invariants) — reference utils/augmentations.py."""

import colorsys

import numpy as np
import pytest

from dropclip_tpu.data.augmentations import (
    ChromaticAutoContrast,
    ChromaticJitter,
    ChromaticTranslation,
    Compose,
    ElasticDistortion,
    HueSaturationTranslation,
    RandomBlobRemovalPerObj,
    RandomHorizontalFlip,
    hsv_to_rgb,
    rgb_to_hsv,
)


def sample(rng_np, n=200):
    coords = rng_np.randn(n, 3).astype(np.float32)
    feats = (rng_np.rand(n, 3) * 255).astype(np.float32)
    labels = rng_np.randint(0, 4, n).astype(np.int32)
    return coords, feats, labels


def test_hsv_roundtrip_matches_colorsys(rng):
    rgb = (rng.rand(50, 3) * 255).astype(np.float64)
    hsv = rgb_to_hsv(rgb)
    for i in range(50):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        assert abs(hsv[i, 0] - h) < 1e-9
        assert abs(hsv[i, 1] - s) < 1e-9
        assert abs(hsv[i, 2] - v) < 1e-9
    back = hsv_to_rgb(hsv)
    for i in range(50):
        r, g, b = colorsys.hsv_to_rgb(*hsv[i])
        # reference truncates to uint8
        assert back[i, 0] == np.uint8(r) and back[i, 2] == np.uint8(b)


def test_color_transforms_stay_in_range(rng):
    coords, feats, labels = sample(rng)
    g = np.random.default_rng(0)
    for t in [ChromaticTranslation(0.1), ChromaticJitter(0.1),
              HueSaturationTranslation(0.5, 0.2),
              ChromaticAutoContrast()]:
        _, f2, _ = t(coords, feats, labels, g)
        assert f2.min() >= 0 and f2.max() <= 255
        assert f2.shape == feats.shape


def test_determinism_with_seeded_generator(rng):
    coords, feats, labels = sample(rng)
    t = Compose([ChromaticTranslation(0.1), ChromaticJitter(0.1),
                 RandomHorizontalFlip("z"),
                 ElasticDistortion([(0.2, 0.4)])])
    out1 = t(coords, feats, labels, np.random.default_rng(7))
    out2 = t(coords, feats, labels, np.random.default_rng(7))
    for a, b in zip(out1, out2):
        assert np.array_equal(a, b)
    out3 = t(coords, feats, labels, np.random.default_rng(8))
    assert not np.array_equal(out1[0], out3[0])


def test_flip_mirrors_axes(rng):
    coords, feats, labels = sample(rng)
    g = np.random.default_rng(3)
    flip = RandomHorizontalFlip("z", p=1.0)
    c2, _, _ = flip(coords, feats, labels, g)
    # z axis untouched
    assert np.array_equal(c2[:, 2], coords[:, 2])
    # any flipped axis is max - x
    for ax in (0, 1):
        flipped = np.allclose(c2[:, ax], coords[:, ax].max() - coords[:, ax])
        identity = np.array_equal(c2[:, ax], coords[:, ax])
        assert flipped or identity


def test_elastic_distortion_perturbs_but_preserves_shape(rng):
    coords, feats, labels = sample(rng, n=500)
    t = ElasticDistortion([(0.2, 0.4)], p=1.0)
    c2, _, _ = t(coords, feats, labels, np.random.default_rng(0))
    assert c2.shape == coords.shape
    d = np.linalg.norm(c2 - coords, axis=1)
    assert d.mean() > 0
    assert d.max() < 5.0  # bounded warp


def test_blob_removal_removes_per_object(rng):
    coords, feats, labels = sample(rng, n=400)
    t = RandomBlobRemovalPerObj(n_blobs_range=(1, 3), blob_size_range=(5, 10))
    c2, f2, l2 = t(coords, feats, labels, np.random.default_rng(0))
    assert len(c2) < len(coords)
    assert len(c2) == len(f2) == len(l2)
    assert t.last_keep is not None and t.last_keep.sum() == len(c2)
    # blobs are spatially coherent: removed points of an object cluster
    removed = ~t.last_keep
    assert removed.sum() == len(coords) - len(c2)
    # labels preserved for survivors
    assert np.array_equal(l2, labels[t.last_keep])
