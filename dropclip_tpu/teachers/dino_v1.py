"""DINO v1 high-resolution ViT descriptor extractor in flax.

Fresh TPU-native implementation of the capability the reference vendors
from dino-vit-features (reference
models/features/dino/dino_vit_extractor.py:17-325): dense per-patch
descriptors from a DINO v1 / timm ViT, at a configurable patch-conv
*stride* smaller than the patch size (overlapping patches -> higher
output resolution), with descriptor facets taken from any block:

- ``query`` / ``key`` / ``value``: per-head attention projections
  (reference :176-190, qkv hook), returned as (B, h, t, d/h);
- ``token``: block output tokens (B, t, d) (reference :171-174);
- ``attn``: post-softmax attention probabilities (B, h, t, t)
  (reference :203, hook on ``attn_drop``).

The reference captures these with torch forward hooks on a mutated
torch.hub module (:167-215); here the ViT forward simply *returns* the
requested facets — the functional-JAX equivalent, one traced program,
no mutation. Stride patching (reference ``patch_vit_resolution``
:126-145) is a module attribute: the patch conv runs at ``stride`` and
the positional embeddings are bicubic-interpolated to the enlarged grid
with the reference's exact +0.1 scale-factor trick (:90-123, via
``ops.resize.bicubic_resize(scale_hw=...)``).

Also ports ``_log_bin`` hierarchical descriptor binning (:237-283) as a
vectorized pool-and-gather (the reference's per-pixel Python loop is
O(HW) host work) and ``extract_saliency_maps`` (:311-325).

Weights convert from facebookresearch/dino checkpoints (``dino_vits8``
etc. state dicts; timm ViTs share the layout after the reference's own
remapping, :70-86).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bicubic_resize
from .dinov2 import _np  # shared torch-tensor -> f32 numpy converter

# reference dino_vit_extractor.py:52-53
DINO_V1_MEAN = (0.485, 0.456, 0.406)
DINO_V1_STD = (0.229, 0.224, 0.225)
TIMM_MEAN = (0.5, 0.5, 0.5)
TIMM_STD = (0.5, 0.5, 0.5)

FACETS = ("query", "key", "value", "token", "attn")


class _Attention(nn.Module):
    """DINO v1 attention with fused qkv (facebookresearch/dino layout).

    ``need_attn`` is static per layer: only a layer whose post-softmax
    probabilities are actually captured (facet ``attn``) pays for the
    materialized (B, h, t, t) matrix. Every other layer takes the Pallas
    path under ``use_flash`` — at hi-res strides t reaches thousands of
    tokens, where the explicit matrix is both the HBM and FLOP
    bottleneck (one-shot VMEM kernel when it fits, flash otherwise)."""

    heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False
    need_attn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t, d = x.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        # (B, t, 3, h, hd) -> 3 x (B, h, t, hd): the reference hook's
        # reshape/permute exactly (dino_vit_extractor.py:188-189).
        qkvh = qkv.reshape(b, t, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkvh[0], qkvh[1], qkvh[2]
        facets = {"query": q, "key": k, "value": v}
        if self.use_flash and not self.need_attn:
            from ..core.platform import env_flag
            from ..ops.attention import (flash_attention_padded,
                                         oneshot_attention,
                                         oneshot_attention_packed, supports,
                                         supports_packed)

            qt = qkv.reshape(b, t, 3, self.heads, hd)
            if (supports_packed(t, self.heads, hd, causal=False,
                                itemsize=qkv.dtype.itemsize)
                    and env_flag("DROPCLIP_PACKED_ATTN", default=True)):
                # packed layout: (B, t, H*D) slabs straight out of the
                # fused qkv projection — no head transposes around the
                # kernel (CLIP-tower hardware A/B: 580 -> 429 ms, PERF.md)
                qkv3 = qkv.reshape(b, t, 3, d)
                out = oneshot_attention_packed(
                    qkv3[:, :, 0], qkv3[:, :, 1], qkv3[:, :, 2], self.heads)
            else:
                qs, ks, vs = qt[:, :, 0], qt[:, :, 1], qt[:, :, 2]  # (B,t,h,hd)
                if supports(t, hd, causal=False, itemsize=qs.dtype.itemsize):
                    out = oneshot_attention(qs, ks, vs)
                else:
                    out = flash_attention_padded(qs, ks, vs)
                out = out.reshape(b, t, d)
        else:
            logits = jnp.einsum(
                "bhqc,bhkc->bhqk", q, k,
                preferred_element_type=jnp.float32) * hd ** -0.5
            probs = jax.nn.softmax(logits, axis=-1)
            facets["attn"] = probs
            out = jnp.einsum("bhqk,bhkc->bhqc", probs.astype(self.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        return out, facets


class _Block(nn.Module):
    """Pre-norm ViT block (no LayerScale — DINO v1, unlike DINOv2)."""

    heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    use_flash: bool = False
    need_attn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        attn_out, facets = _Attention(self.heads, dtype=self.dtype,
                                      use_flash=self.use_flash,
                                      need_attn=self.need_attn,
                                      name="attn")(h)
        x = x + attn_out
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            self.dtype)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        x = x + h
        facets["token"] = x
        return x, facets


class DinoV1ViT(nn.Module):
    """DINO v1 ViT whose forward returns requested per-layer facets.

    ``__call__(pixels NHWC, capture=((layer, facet), ...))`` ->
    ``(final tokens (B, t, D), {(layer, facet): array})``. ``capture``
    must be a static (hashable) tuple — it selects which intermediates
    are returned, the JAX replacement for the reference's hook registry
    (dino_vit_extractor.py:192-215).
    """

    width: int = 384
    layers: int = 12
    heads: int = 6
    patch_size: int = 8
    stride: int = 8
    image_resolution: int = 224
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    use_flash: bool = False  # Pallas attention for non-captured layers

    @nn.compact
    def __call__(self, pixels: jnp.ndarray,
                 capture: Tuple[Tuple[int, str], ...] = ()):
        if self.patch_size % self.stride:
            # reference patch_vit_resolution assert (:138-139)
            raise ValueError(
                f"stride {self.stride} should divide patch_size "
                f"{self.patch_size}")
        b = pixels.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.stride, padding="VALID", dtype=self.dtype,
                    name="patch_embed")(pixels.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.width))
        n_native = (self.image_resolution // self.patch_size) ** 2
        pe = self.param("pos_embed", nn.initializers.normal(0.02),
                        (1, n_native + 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x],
            axis=1)
        x = x + self._interp_pos(pe, gh, gw).astype(x.dtype)

        captured: Dict[Tuple[int, str], jnp.ndarray] = {}
        for i in range(self.layers):
            # only a layer whose 'attn' facet is captured materializes
            # the (B, h, t, t) probabilities
            need_attn = any(layer == i and facet == "attn"
                            for (layer, facet) in capture)
            x, facets = _Block(self.heads, self.mlp_ratio, dtype=self.dtype,
                               use_flash=self.use_flash,
                               need_attn=need_attn,
                               name=f"block_{i}")(x)
            for (layer, facet) in capture:
                if layer == i:
                    captured[(layer, facet)] = facets[facet]
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x, captured

    def _interp_pos(self, pe: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        og = self.image_resolution // self.patch_size
        if gh == og and gw == og:
            return pe
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        # +0.1 scale trick + recompute_scale_factor=False, exactly as the
        # reference's interpolate_pos_encoding (dino_vit_extractor.py:
        # 110-118); bicubic_resize implements torch's kernel.
        resized = bicubic_resize(
            patch_pe.reshape(og, og, self.width), (gh, gw),
            scale_hw=((gh + 0.1) / og, (gw + 0.1) / og))
        return jnp.concatenate(
            [cls_pe, resized.reshape(1, gh * gw, self.width)], axis=1)


# reference model_type zoo (dino_vit_extractor.py:33-34, 76-81): timm
# names alias the dino architectures (weights differ, layout identical).
DINO_V1_CONFIGS = {
    "dino_vits8": dict(width=384, layers=12, heads=6, patch_size=8),
    "dino_vits16": dict(width=384, layers=12, heads=6, patch_size=16),
    "dino_vitb8": dict(width=768, layers=12, heads=12, patch_size=8),
    "dino_vitb16": dict(width=768, layers=12, heads=12, patch_size=16),
    "vit_small_patch8_224": dict(width=384, layers=12, heads=6,
                                 patch_size=8),
    "vit_small_patch16_224": dict(width=384, layers=12, heads=6,
                                  patch_size=16),
    "vit_base_patch8_224": dict(width=768, layers=12, heads=12,
                                patch_size=8),
    "vit_base_patch16_224": dict(width=768, layers=12, heads=12,
                                 patch_size=16),
    "tiny-test": dict(width=32, layers=2, heads=4, patch_size=4,
                      image_resolution=16),
    # 12-layer tiny: lets the reference-executing oracle drive the REAL
    # extractor (its saliency path hardcodes layer 11 / heads 0,2,4,5 —
    # dino_vit_extractor.py:318-321) at toy cost
    "tiny-test-deep": dict(width=48, layers=12, heads=6, patch_size=4,
                           image_resolution=16),
}


def build_dino_v1(model_type: str, stride: int, dtype=jnp.float32,
                  use_flash=None) -> DinoV1ViT:
    if model_type not in DINO_V1_CONFIGS:
        raise ValueError(f"unknown DINO v1 model_type {model_type!r}")
    if use_flash is None:  # same auto-switch as the other teachers
        use_flash = jax.default_backend() == "tpu"
    return DinoV1ViT(stride=stride, dtype=dtype, use_flash=use_flash,
                     **DINO_V1_CONFIGS[model_type])


def from_dino_v1(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """facebookresearch/dino ViT state dict -> DinoV1ViT params."""
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("blocks."))
    lin = lambda p: {"kernel": _np(sd[f"{p}.weight"]).T,
                     "bias": _np(sd[f"{p}.bias"])}
    ln = lambda p: {"scale": _np(sd[f"{p}.weight"]),
                    "bias": _np(sd[f"{p}.bias"])}
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"])},
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": ln("norm"),
    }
    for i in range(n_layers):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "attn": {"qkv": lin(f"{p}.attn.qkv"),
                     "proj": lin(f"{p}.attn.proj")},
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        }
    return params


def _sum_pool(x: jnp.ndarray, win: int, pad: int) -> jnp.ndarray:
    """Stride-1 sum pool over the two middle dims of (B, H, W, C)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def log_bin(x: jnp.ndarray, grid: Tuple[int, int], hierarchy: int = 2
            ) -> jnp.ndarray:
    """Hierarchical log-binned descriptors (reference _log_bin :237-283).

    x: (B, h, t-1, d) per-head facet WITHOUT the cls token. Returns
    (B, 1, t-1, (1 + 8*hierarchy) * h*d): per spatial location, the
    center descriptor plus its 8-neighborhoods averaged over 3^k x 3^k
    windows at dilation 3^k, edge-clamped, concatenated in the
    reference's (k, dy, dx) order. Vectorized: stride-1 average pools
    with count_include_pad=False semantics + clamped shifts, instead of
    the reference's per-(y, x) Python loop.
    """
    b, h, t1, d = x.shape
    gh, gw = grid
    assert gh * gw == t1, (grid, t1)
    # (B, t-1, d, h) flatten -> the reference's sub-descriptor channel
    # order (d-major over heads, :246)
    maps = x.transpose(0, 2, 3, 1).reshape(b, gh, gw, d * h)

    ones = jnp.ones((1, gh, gw, 1), maps.dtype)
    pools = []
    for k in range(hierarchy):
        win = 3 ** k
        pad = win // 2
        # AvgPool2d(count_include_pad=False): divide by in-bounds count
        pools.append(_sum_pool(maps, win, pad) / _sum_pool(ones, win, pad))

    ys = jnp.arange(gh)
    xs = jnp.arange(gw)
    parts = []
    for k in range(hierarchy):
        step = 3 ** k
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if k != 0 and dy == 0 and dx == 0:
                    continue  # center only binned once (:269-270)
                yi = jnp.clip(ys + dy, 0, gh - 1)
                xj = jnp.clip(xs + dx, 0, gw - 1)
                parts.append(pools[k][:, yi][:, :, xj])
    binned = jnp.concatenate(parts, axis=-1)
    return binned.reshape(b, 1, t1, len(parts) * d * h)


class ViTExtractor:
    """Descriptor/saliency extraction API (reference ViTExtractor :17-325).

    Images are NHWC float, already normalized (see ``preprocess``).
    Descriptor shapes match the reference: ``extract_descriptors`` ->
    (B, 1, t, d'), ``extract_saliency_maps`` -> (B, t-1).
    """

    def __init__(self, model_type: str = "dino_vits8", stride: int = 4,
                 variables=None, dtype=jnp.float32):
        self.model_type = model_type
        self.model = build_dino_v1(model_type, stride, dtype=dtype)
        self.p = self.model.patch_size
        self.stride = (stride, stride)
        if "dino" in model_type or model_type.startswith("tiny-test"):
            self.mean, self.std = DINO_V1_MEAN, DINO_V1_STD
        else:
            self.mean, self.std = TIMM_MEAN, TIMM_STD
        if variables is None:
            px = jnp.zeros((1, self.model.image_resolution,
                            self.model.image_resolution, 3))
            variables = jax.jit(
                lambda x: self.model.init(jax.random.PRNGKey(0), x))(px)
        self.variables = variables
        self.load_size: Tuple[int, int] = None
        self.num_patches: Tuple[int, int] = None
        self._fwd = jax.jit(
            lambda v, px, capture: self.model.apply(v, px, capture=capture),
            static_argnums=2)

    def preprocess(self, image: np.ndarray,
                   load_size: Any = None) -> np.ndarray:
        """uint8 HWC RGB -> normalized (1, H, W, 3) float32 (reference
        :147-165; LANCZOS resize via cv2 instead of PIL)."""
        import cv2

        if load_size is not None:
            if isinstance(load_size, int):
                h, w = image.shape[:2]
                s = load_size / min(h, w)
                size = (int(round(w * s)), int(round(h * s)))
            else:
                size = (int(load_size[1]), int(load_size[0]))
            image = cv2.resize(image, size, interpolation=cv2.INTER_LANCZOS4)
        x = image.astype(np.float32) / 255.0
        x = (x - np.asarray(self.mean, np.float32)) / np.asarray(
            self.std, np.float32)
        return x[None]

    def _run(self, batch, layer: int, facet: str) -> jnp.ndarray:
        batch = jnp.asarray(batch)
        _, h, w, _ = batch.shape
        self.load_size = (h, w)
        self.num_patches = (1 + (h - self.p) // self.stride[0],
                            1 + (w - self.p) // self.stride[1])
        _, captured = self._fwd(self.variables, batch, ((layer, facet),))
        return captured[(layer, facet)]

    def extract_descriptors(self, batch, layer: int = 11,
                            facet: str = "key", bin: bool = False,
                            include_cls: bool = False) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, 1, t, d') descriptors (reference :285-309)."""
        if facet not in ("key", "query", "value", "token"):
            raise ValueError(
                f"{facet} is not a supported facet for descriptors")
        if bin and include_cls:
            raise ValueError("bin=True and include_cls=True are not "
                             "supported together")
        if not 0 <= layer < self.model.layers:
            raise ValueError(f"layer {layer} out of range "
                             f"[0, {self.model.layers})")
        x = self._run(batch, layer, facet)
        if facet == "token":
            x = x[:, None]  # (B, 1, t, d)
        if not include_cls:
            x = x[:, :, 1:, :]
        if not bin:
            b, h, t, d = x.shape
            return x.transpose(0, 2, 3, 1).reshape(b, t, d * h)[:, None]
        return log_bin(x, self.num_patches)

    def extract_saliency_maps(self, batch) -> jnp.ndarray:
        """cls-attention saliency in [0, 1], (B, t-1) (reference :311-325)."""
        if self.model_type not in ("dino_vits8", "tiny-test",
                           "tiny-test-deep"):
            raise ValueError("saliency maps are supported only for "
                             "dino_vits8 model_type")
        probs = self._run(batch, self.model.layers - 1, "attn")
        head_idxs = [i for i in (0, 2, 4, 5) if i < self.model.heads]
        cls_attn = probs[:, head_idxs, 0, 1:].mean(axis=1)  # (B, t-1)
        lo = cls_attn.min(axis=1, keepdims=True)
        hi = cls_attn.max(axis=1, keepdims=True)
        # eps: a degenerate view with constant cls-attention must yield
        # zeros, not NaN (ADVICE r1)
        return (cls_attn - lo) / jnp.maximum(hi - lo, 1e-12)
