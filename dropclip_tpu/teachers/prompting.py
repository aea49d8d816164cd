"""Object-centric visual prompting, fully on device.

TPU-native redesign of the reference's prompt builder + preprocessing
(reference models/features/extractor.py:306-367 ``make_prompt``,
utils/image.py:45-86 box helpers, extractor.py:46-69 torchvision
Resize+Normalize): the reference loops host-side over (view, object,
prompt-level), building PIL crops one at a time. Here the whole chain —
bbox-from-mask, multi-level expansion, crop, aspect-ratio padding with a
background color, resize to the model input, CLIP normalization — is pure
jnp arithmetic + gathers with static output shapes, so one jit program
turns an image + K instance masks into a (K, L, H, W, 3) prompt batch that
feeds the batched CLIP forward. Crop boxes are dynamic *values*, never
dynamic *shapes*: the crop->pad->resize composition is evaluated as one
bicubic sampling into the fixed model grid, with taps falling outside the
crop reading the background color.

Deliberate deviation: the reference resizes PIL images (Pillow bicubic,
a=-0.5, antialiased); we use the torch/OpenCV cubic kernel (a=-0.75, no
antialias) everywhere for consistency with the rest of the framework. The
teachers are frozen, so this shifts features by <1e-2 — far below the
fusion weighting noise floor.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import _cubic_weights

# torchvision CLIP normalization constants (extractor.py:66-69)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)

PROMPT_KINDS = ("crop", "crop-mask", "mask-blur", "mask-gray", "mask-out")


def mask_to_box(mask: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool -> (x1, y1, x2, y2) int32, x2/y2 exclusive (reference
    utils/image.py:45-54 mask2box). Empty mask -> (0, 0, 1, 1)."""
    h, w = mask.shape
    any_col = jnp.any(mask, axis=0)
    any_row = jnp.any(mask, axis=1)
    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    x1 = jnp.min(jnp.where(any_col, xs, w))
    x2 = jnp.max(jnp.where(any_col, xs, -1)) + 1
    y1 = jnp.min(jnp.where(any_row, ys, h))
    y2 = jnp.max(jnp.where(any_row, ys, -1)) + 1
    empty = ~jnp.any(mask)
    box = jnp.stack([x1, y1, x2, y2])
    return jnp.where(empty, jnp.asarray([0, 0, 1, 1], jnp.int32), box)


def expand_box(box: jnp.ndarray, level: int, expansion_ratio: float,
               hw: Tuple[int, int]) -> jnp.ndarray:
    """Multi-level box expansion (reference utils/image.py:77-86)."""
    if level == 0:
        return box
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    x_exp = (jnp.abs(x2 - x1) * expansion_ratio).astype(jnp.int32) * level
    y_exp = (jnp.abs(y2 - y1) * expansion_ratio).astype(jnp.int32) * level
    return jnp.stack([jnp.maximum(0, x1 - x_exp), jnp.maximum(0, y1 - y_exp),
                      jnp.minimum(hw[1], x2 + x_exp),
                      jnp.minimum(hw[0], y2 + y_exp)])


def background_color(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Black if the object is closer to white, else white — 0..255 floats
    (reference extractor.py:308-320 obtain_background_color)."""
    w = mask.astype(jnp.float32)[..., None]
    mean = (jnp.sum(image.astype(jnp.float32) * w, axis=(0, 1))
            / jnp.maximum(jnp.sum(w), 1.0))
    to_white = jnp.linalg.norm(mean - 255.0)
    to_black = jnp.linalg.norm(mean)
    return jnp.where(to_white < to_black,
                     jnp.zeros(3, jnp.float32), jnp.full(3, 255.0, jnp.float32))


def crop_pad_resize(image: jnp.ndarray, box: jnp.ndarray, bg: jnp.ndarray,
                    out_hw: Tuple[int, int], target_ratio: float) -> jnp.ndarray:
    """crop box -> pad to target W/H ratio with bg -> bicubic resize.

    One fused sampling of the composition (reference crops, pads via
    utils/image.py:57-74 add_borders_to_image, then torchvision-resizes,
    extractor.py:326-341). image: (H, W, 3) float 0..255; box dynamic
    (x1, y1, x2, y2); out: (oh, ow, 3).
    """
    H, W = image.shape[0], image.shape[1]
    oh, ow = out_hw
    x1, y1 = box[0].astype(jnp.float32), box[1].astype(jnp.float32)
    w = (box[2] - box[0]).astype(jnp.float32)
    h = (box[3] - box[1]).astype(jnp.float32)

    # padded-canvas size (integer semantics of add_borders_to_image)
    ratio = w / h
    ph = jnp.where(ratio > target_ratio, jnp.floor(w / target_ratio), h)
    pw = jnp.where(ratio < target_ratio, jnp.floor(h * target_ratio), w)
    pad_top = jnp.floor((ph - h) / 2.0)
    pad_left = jnp.floor((pw - w) / 2.0)

    # output pixel -> padded-canvas source coordinate (torch half-pixel)
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (ph / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (pw / ow) - 0.5
    # clamp taps at the padded-canvas border (torch border replication)
    iy0 = jnp.floor(ys)
    ix0 = jnp.floor(xs)
    wy = _cubic_weights(ys - iy0)  # (oh, 4)
    wx = _cubic_weights(xs - ix0)  # (ow, 4)
    ty = jnp.clip(iy0[:, None] + jnp.arange(-1, 3, dtype=jnp.float32),
                  0, ph - 1)  # (oh, 4) padded-space rows
    tx = jnp.clip(ix0[:, None] + jnp.arange(-1, 3, dtype=jnp.float32),
                  0, pw - 1)  # (ow, 4)

    # padded-space -> crop content: rows [pad_top, pad_top+h), else bg
    cy = ty - pad_top
    cx = tx - pad_left
    in_y = (cy >= 0) & (cy < h)  # (oh, 4)
    in_x = (cx >= 0) & (cx < w)  # (ow, 4)
    gy = jnp.clip(cy + y1, 0, H - 1).astype(jnp.int32)
    gx = jnp.clip(cx + x1, 0, W - 1).astype(jnp.int32)

    # SEPARABLE two-pass resample with ROW-granular gathers: a single
    # (oh, 4, ow, 4) tap gather hits TPU's slow scattered-gather path
    # (~0.4 s per view at 480x640); full-row gathers run at memory speed.
    # Exact because cubic weights sum to 1, so the out-of-crop background
    # factors through the vertical pass unchanged.
    img_f = image.astype(jnp.float32)
    rows = img_f[gy.reshape(-1)]                    # (oh*4, W, 3)
    rows = rows.reshape(oh, 4, W, 3)
    rows = jnp.where(in_y[:, :, None, None], rows, bg)
    r = jnp.einsum("yawc,ya->ywc", rows, wy)        # (oh, W, 3)

    rt = r.transpose(1, 0, 2)                       # (W, oh, 3)
    cols = rt[gx.reshape(-1)]                       # (ow*4, oh, 3)
    cols = cols.reshape(ow, 4, oh, 3)
    cols = jnp.where(in_x[:, :, None, None], cols, bg)
    out = jnp.einsum("xboc,xb->xoc", cols, wx)      # (ow, oh, 3)
    return out.transpose(1, 0, 2)


def resize_image(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Plain full-image bicubic resize (the no-crop preprocessing path,
    extractor.py:46-69 with img_crop=None, center_crop=None)."""
    from ..ops.resize import bicubic_resize

    return bicubic_resize(image.astype(jnp.float32), out_hw)


def normalize(image01: jnp.ndarray, mean=CLIP_MEAN, std=CLIP_STD) -> jnp.ndarray:
    """(…, 3) in 0..1 -> CLIP-normalized."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (image01 - m) / s


def _conv1d_reflect(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Correlate (H, W, C) along ``axis`` with an odd kernel, REFLECT_101
    border (jnp 'reflect' == cv2 BORDER_REFLECT_101), as a fused
    shift-and-add (XLA folds the K slices into one loop)."""
    r = kernel.shape[0] // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, mode="reflect")
    n = x.shape[axis]
    out = jnp.zeros_like(x)
    for i in range(kernel.shape[0]):
        out = out + kernel[i] * jax.lax.dynamic_slice_in_dim(xp, i, n, axis)
    return out


def gaussian_blur(image: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """cv2.GaussianBlur(image, (k, k), 0) parity: sigma from ksize
    (cv2 rule: 0.3*((k-1)*0.5 - 1) + 0.8), separable, REFLECT_101 border."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img = image.astype(jnp.float32)
    return _conv1d_reflect(_conv1d_reflect(img, k, 0), k, 1)


def rgb_to_gray3(image: jnp.ndarray) -> jnp.ndarray:
    """cv2 RGB2GRAY weights, replicated to 3 channels (extractor.py:355-360)."""
    g = (0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2])
    return jnp.stack([g, g, g], axis=-1)


def num_prompts(kinds: Sequence[str], crop_num_levels: int) -> int:
    n = 0
    for kind in kinds:
        if kind in ("crop", "crop-mask"):
            n += crop_num_levels
        else:
            n += 1
    return n


def build_prompts(
    image: jnp.ndarray,
    masks: jnp.ndarray,
    kinds: Sequence[str] = ("crop-mask",),
    crop_num_levels: int = 1,
    crop_expansion_ratio: float = 0.15,
    blur_kernel: int = 41,
    out_hw: Tuple[int, int] = (336, 448),
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> jnp.ndarray:
    """Image (H, W, 3) uint8/float 0..255 + (K, H, W) bool instance masks ->
    (K, L, oh, ow, 3) normalized prompt batch (reference make_prompt,
    extractor.py:306-367, for every object at once)."""
    for kind in kinds:
        if kind not in PROMPT_KINDS:
            raise ValueError(f"unknown visual prompt {kind!r}")
    H, W = image.shape[0], image.shape[1]
    oh, ow = out_hw
    target_ratio = float(W) / float(H)
    img_f = image.astype(jnp.float32)

    # full-image variants shared across objects
    blurred = gaussian_blur(img_f, blur_kernel) if "mask-blur" in kinds else None
    gray = rgb_to_gray3(img_f) if "mask-gray" in kinds else None

    def per_object(mask):
        bg = background_color(img_f, mask)
        box0 = mask_to_box(mask)
        m3 = mask[..., None]
        prompts = []
        for kind in kinds:
            if kind == "crop":
                for level in range(crop_num_levels):
                    b = expand_box(box0, level, crop_expansion_ratio, (H, W))
                    prompts.append(crop_pad_resize(img_f, b, bg, out_hw,
                                                   target_ratio))
            elif kind == "crop-mask":
                comp = jnp.where(m3, img_f, bg)
                for level in range(crop_num_levels):
                    b = expand_box(box0, level, crop_expansion_ratio, (H, W))
                    prompts.append(crop_pad_resize(comp, b, bg, out_hw,
                                                   target_ratio))
            elif kind == "mask-blur":
                comp = jnp.where(m3, img_f, blurred)
                prompts.append(resize_image(comp, out_hw))
            elif kind == "mask-gray":
                comp = jnp.where(m3, img_f, gray)
                prompts.append(resize_image(comp, out_hw))
            elif kind == "mask-out":
                comp = jnp.where(m3, img_f, bg)
                prompts.append(resize_image(comp, out_hw))
        return jnp.stack(prompts)  # (L, oh, ow, 3)

    # sequential over objects: the per-object bicubic tap tensors are
    # ~30 MB each, so a vmap would materialize K x that (OOM at K=32);
    # lax.map keeps one object's working set live while XLA pipelines.
    batch = jax.lax.map(per_object, masks)  # (K, L, oh, ow, 3), 0..255
    return normalize(batch / 255.0, mean, std)
