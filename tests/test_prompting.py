"""Tests for device-side visual prompting vs numpy/cv2/torch oracles of the
reference chain (extractor.py:306-367 make_prompt, utils/image.py:45-86
box helpers, extractor.py:46-69 preprocessing)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.teachers.prompting import (  # noqa: E402
    CLIP_MEAN,
    CLIP_STD,
    background_color,
    build_prompts,
    crop_pad_resize,
    expand_box,
    gaussian_blur,
    mask_to_box,
    normalize,
    num_prompts,
    resize_image,
    rgb_to_gray3,
)


def ref_mask2box(mask):
    """reference utils/image.py:45-54."""
    row = np.nonzero(mask.sum(axis=0))[0]
    col = np.nonzero(mask.sum(axis=1))[0]
    return row.min(), col.min(), row.max() + 1, col.max() + 1


def ref_add_borders(image, target_ratio, color):
    """reference utils/image.py:57-74."""
    h, w = image.shape[:2]
    cur = w / h
    if cur > target_ratio:
        new_h = int(w / target_ratio)
        p = (new_h - h) // 2
        out = np.ones((new_h, w, 3), image.dtype) * color
        out[p:p + h] = image
    elif cur < target_ratio:
        new_w = int(h * target_ratio)
        p = (new_w - w) // 2
        out = np.ones((h, new_w, 3), image.dtype) * color
        out[:, p:p + w] = image
    else:
        out = image
    return out


def torch_resize(img_hwc, out_hw):
    t = torch.as_tensor(img_hwc, dtype=torch.float32).permute(2, 0, 1)[None]
    y = F.interpolate(t, size=tuple(out_hw), mode="bicubic", align_corners=False)
    return y[0].permute(1, 2, 0).numpy()


def test_mask_to_box(rng):
    for _ in range(5):
        mask = np.zeros((30, 40), bool)
        y, x = rng.randint(0, 25), rng.randint(0, 35)
        mask[y:y + rng.randint(1, 5), x:x + rng.randint(1, 5)] = True
        x1, y1, x2, y2 = ref_mask2box(mask)
        got = np.asarray(mask_to_box(jnp.asarray(mask)))
        assert tuple(got) == (x1, y1, x2, y2)


def test_expand_box_matches_reference():
    """reference utils/image.py:77-86 mask2box_multi_level."""
    mask = np.zeros((48, 64), bool)
    mask[10:30, 20:50] = True
    box = mask_to_box(jnp.asarray(mask))
    for level in range(3):
        x1, y1, x2, y2 = 20, 10, 50, 30
        if level > 0:
            xe = int(abs(x2 - x1) * 0.15) * level
            ye = int(abs(y2 - y1) * 0.15) * level
            want = (max(0, x1 - xe), max(0, y1 - ye),
                    min(64, x2 + xe), min(48, y2 + ye))
        else:
            want = (x1, y1, x2, y2)
        got = tuple(np.asarray(expand_box(box, level, 0.15, (48, 64))))
        assert got == want, level


def test_background_color_rule(rng):
    img = np.full((10, 10, 3), 240, np.uint8)
    mask = np.zeros((10, 10), bool)
    mask[2:5, 2:5] = True
    # bright object -> black background
    assert np.allclose(np.asarray(background_color(jnp.asarray(img),
                                                   jnp.asarray(mask))), 0.0)
    img2 = np.full((10, 10, 3), 10, np.uint8)
    assert np.allclose(np.asarray(background_color(jnp.asarray(img2),
                                                   jnp.asarray(mask))), 255.0)


@pytest.mark.parametrize("boxdims", [(5, 8, 25, 40), (0, 0, 64, 48),
                                     (10, 20, 14, 44), (30, 2, 60, 10)])
def test_crop_pad_resize_matches_composition(rng, boxdims):
    """Fused sampler == crop -> numpy pad -> torch bicubic resize."""
    H, W, OH, OW = 48, 64, 24, 32
    img = rng.rand(H, W, 3).astype(np.float32) * 255
    x1, y1, x2, y2 = boxdims
    bg = np.array([200.0, 100.0, 50.0], np.float32)
    want = torch_resize(
        ref_add_borders(img[y1:y2, x1:x2], W / H, bg), (OH, OW))
    got = np.asarray(crop_pad_resize(
        jnp.asarray(img), jnp.asarray([x1, y1, x2, y2]), jnp.asarray(bg),
        (OH, OW), W / H))
    assert np.max(np.abs(got - want)) < 1e-2, np.max(np.abs(got - want))


def test_gaussian_blur_matches_cv2(rng):
    img = (rng.rand(40, 56, 3) * 255).astype(np.float32)
    want = cv2.GaussianBlur(img, (41, 41), 0)
    got = np.asarray(gaussian_blur(jnp.asarray(img), 41))
    assert np.max(np.abs(got - want)) < 1e-2


def test_gray_matches_cv2(rng):
    img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
    g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    want = cv2.merge([g, g, g]).astype(np.float32)
    got = np.asarray(rgb_to_gray3(jnp.asarray(img).astype(jnp.float32)))
    assert np.max(np.abs(got - want)) < 0.51  # cv2 rounds to uint8


def test_build_prompts_end_to_end(rng):
    """All five prompt kinds, 2 objects, correct count/shape/normalization."""
    H, W = 48, 64
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    masks = np.zeros((2, H, W), bool)
    masks[0, 5:20, 10:30] = True
    masks[1, 25:40, 35:60] = True
    kinds = ("crop", "crop-mask", "mask-blur", "mask-gray", "mask-out")
    L = num_prompts(kinds, crop_num_levels=2)
    assert L == 2 + 2 + 3
    out = build_prompts(jnp.asarray(img), jnp.asarray(masks), kinds=kinds,
                        crop_num_levels=2, out_hw=(24, 32), blur_kernel=11)
    assert out.shape == (2, L, 24, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # normalization applied: values centered near CLIP range, not 0..255
    assert float(jnp.max(jnp.abs(out))) < 5.0

    # the mask-out prompt equals resize(composite) + normalize, computed
    # manually for object 0
    bg = np.asarray(background_color(jnp.asarray(img.astype(np.float32)),
                                     jnp.asarray(masks[0])))
    comp = np.where(masks[0][..., None], img.astype(np.float32), bg)
    want = np.asarray(normalize(
        jnp.asarray(torch_resize(comp, (24, 32))) / 255.0))
    got = np.asarray(out[0, -1])
    assert np.max(np.abs(got - want)) < 1e-2


def test_resize_image_is_plain_bicubic(rng):
    img = rng.rand(48, 64, 3).astype(np.float32) * 255
    want = torch_resize(img, (24, 32))
    got = np.asarray(resize_image(jnp.asarray(img), (24, 32)))
    assert np.max(np.abs(got - want)) < 1e-2
