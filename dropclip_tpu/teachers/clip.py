"""CLIP (ViT vision tower + text transformer) as flax modules, TPU-first.

Fresh implementation of the architecture the reference vendors
(reference models/features/clip/model.py:180-440), with the two extensions
the DROP-CLIP pipeline depends on:

- **MaskCLIP patch mode** (`patch_output=True`): run all but the last
  transformer block, then apply only the *value path* of the last block —
  out_proj(V-projection(ln_1(x))), no residual, no MLP — drop the class
  token, ln_post, project (reference model.py:214-226, 277-291).
- **Positional-embedding interpolation** for non-square inputs via
  torch-parity bicubic with the DINO +0.1 scale trick (reference
  interpolate.py:5-54); the canonical teacher runs at 336x448.

TPU-first choices: NHWC images; LayerNorm/softmax always in float32 with
activations in a configurable compute dtype (bf16 on TPU — replacing the
reference's fp16 weight conversion, model.py:445-466); attention is one
fused dot-product-attention per block (XLA fuses QK^T-softmax-V onto the
MXU); weights stay float32 ``param_dtype`` so one set of checkpoints
serves all policies.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import bicubic_resize

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation (model.py:190-192)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32, result cast back to the input dtype
    (parity with the reference's fp16-safe LayerNorm, model.py:180-187).

    On TPU this runs as a Pallas kernel (ops/layernorm.py): XLA's own
    residual-add+LN fusions measure ~3x the VPU floor at the ViT-L hot
    shape and were 33% of the whole teacher forward (PERF.md)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.layernorm import layer_norm

        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return layer_norm(x, scale, bias, eps=self.epsilon)


def _flash_attention(q, k, v, causal: bool):
    """Pallas TPU flash attention with seq padded to 128 multiples and
    segment-id masking for the pad (the XLA attention path materializes
    (B, H, T, T) logits in HBM — the ViT-L teacher ran at ~10 TF/s on it;
    flash with full-row q blocks measures ~15 TF/s at T=769, D=64)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, t, h, d = q.shape
    tp = ((t + 127) // 128) * 128
    pad = tp - t
    qt = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    seg = jnp.concatenate([jnp.zeros((b, t), jnp.int32),
                           jnp.ones((b, pad), jnp.int32)], axis=1)
    bs = BlockSizes(block_q=tp, block_k_major=tp, block_k=128, block_b=1,
                    block_q_major_dkv=tp, block_k_major_dkv=tp,
                    block_q_dkv=tp, block_k_dkv=128,
                    block_q_dq=tp, block_k_dq=tp, block_k_major_dq=tp)
    out = flash_attention(qt, kt, vt, segment_ids=SegmentIds(q=seg, kv=seg),
                          causal=causal, sm_scale=d ** -0.5, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :t]


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (converter-friendly
    for both the OpenAI fused-in_proj and HF split layouts)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    def setup(self):
        dense = lambda name: nn.Dense(self.width, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")

    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        import os

        b, t, d = x.shape
        hd = d // self.heads
        qp, kp, vp = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        if self.use_flash:
            from ..ops.attention import (oneshot_attention,
                                         oneshot_attention_packed, supports,
                                         supports_packed)

            # packed-layout one-shot kernel consumes the projection
            # matmul outputs directly — the (B,T,H,D)->(B*H,T,D)
            # transposes + pads XLA materializes around the per-head
            # kernel were ~150 ms of the 571 ms ViT-L teacher chunk
            # (PERF.md); per-head one-shot and flash remain as fallbacks
            # opt-in until Mosaic-verified on real TPU (partial tail
            # blocks): a compile rejection here would take down every
            # teacher path including the driver's bench
            if (supports_packed(t, self.heads, hd, causal,
                                itemsize=qp.dtype.itemsize)
                    and bool(os.environ.get("DROPCLIP_PACKED_ATTN"))):
                return self.out_proj(
                    oneshot_attention_packed(qp, kp, vp, self.heads))
            q = qp.reshape(b, t, self.heads, hd)
            k = kp.reshape(b, t, self.heads, hd)
            v = vp.reshape(b, t, self.heads, hd)
            # one-shot VMEM kernel beats both flash and XLA dpa at ViT
            # lengths (17.0 vs 13.0 / 13.6 TF/s at T=769, see PERF.md);
            # flash remains for causal (text tower) and long sequences
            if supports(t, hd, causal, itemsize=q.dtype.itemsize):
                out = oneshot_attention(q, k, v)
            else:
                out = _flash_attention(q, k, v, causal)
        else:
            q = qp.reshape(b, t, self.heads, hd)
            k = kp.reshape(b, t, self.heads, hd)
            v = vp.reshape(b, t, self.heads, hd)
            out = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
        out = out.reshape(b, t, d)
        return self.out_proj(out)

    def value_path(self, x: jnp.ndarray) -> jnp.ndarray:
        """out_proj(V-projection(x)) — the MaskCLIP trick (model.py:214-226)."""
        return self.out_proj(self.v_proj(x))


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    def setup(self):
        self.ln_1 = LayerNormF32()
        self.attn = MultiHeadAttention(self.width, self.heads,
                                       dtype=self.dtype,
                                       use_flash=self.use_flash)
        self.ln_2 = LayerNormF32()
        self.c_fc = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")
        self.c_proj = nn.Dense(self.width, dtype=self.dtype, name="c_proj")

    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        x = x + self.attn(self.ln_1(x), causal=causal)
        return x + self.c_proj(quick_gelu(self.c_fc(self.ln_2(x))))

    def forward_v(self, x: jnp.ndarray) -> jnp.ndarray:
        """Value-path only; no residual, no MLP (reference model.py:214-226)."""
        return self.attn.value_path(self.ln_1(x))


class CLIPVisionTransformer(nn.Module):
    """ViT tower. __call__(pixels NHWC) -> (B, embed_dim) cls features or
    (B, n_patches, embed_dim) patch features when ``patch_output``."""

    width: int
    layers: int
    heads: int
    patch_size: int
    embed_dim: int
    image_resolution: int  # square training resolution defining pos-embed grid
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    def setup(self):
        scale = self.width ** -0.5
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,))
        grid = self.image_resolution // self.patch_size
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (grid * grid + 1, self.width))
        self.conv1 = nn.Conv(self.width, (self.patch_size, self.patch_size),
                             strides=self.patch_size, use_bias=False,
                             dtype=self.dtype, name="conv1")
        self.ln_pre = LayerNormF32()
        self.blocks = [ResidualAttentionBlock(self.width, self.heads,
                                              dtype=self.dtype,
                                              use_flash=self.use_flash,
                                              name=f"block_{i}")
                       for i in range(self.layers)]
        self.ln_post = LayerNormF32()
        self.proj = self.param("proj", nn.initializers.normal(scale),
                               (self.width, self.embed_dim))

    def _interpolated_pos_embed(self, grid_h: int, grid_w: int) -> jnp.ndarray:
        """Bicubic pos-embed resampling, DINO +0.1 trick (interpolate.py:5-54)."""
        pe = self.positional_embedding
        og = self.image_resolution // self.patch_size
        if grid_h == og and grid_w == og:
            return pe
        cls_pe, patch_pe = pe[:1], pe[1:]
        h0, w0 = grid_h + 0.1, grid_w + 0.1
        resized = bicubic_resize(
            patch_pe.reshape(og, og, self.width), (grid_h, grid_w),
            scale_hw=(h0 / og, w0 / og))
        return jnp.concatenate([cls_pe, resized.reshape(-1, self.width)], axis=0)

    def _embed(self, pixels: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = pixels.shape
        x = self.conv1(pixels.astype(self.dtype))  # (B, gh, gw, width)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)
        cls = jnp.broadcast_to(self.class_embedding.astype(x.dtype),
                               (b, 1, self.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self._interpolated_pos_embed(gh, gw).astype(x.dtype)
        return self.ln_pre(x)

    def __call__(self, pixels: jnp.ndarray,
                 patch_output: bool = False) -> jnp.ndarray:
        x = self._embed(pixels)
        if patch_output:
            for blk in self.blocks[:-1]:
                x = blk(x)
            x = self.blocks[-1].forward_v(x)
            x = self.ln_post(x[:, 1:, :])
            return x @ self.proj.astype(x.dtype)
        for blk in self.blocks:
            x = blk(x)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj.astype(x.dtype)


class CLIPTextTransformer(nn.Module):
    """Causal text tower; pooled at the EOT token = argmax token id
    (reference model.py:413-426)."""

    width: int
    layers: int
    heads: int
    vocab_size: int
    context_length: int
    embed_dim: int
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    def setup(self):
        self.token_embedding = nn.Embed(self.vocab_size, self.width,
                                        embedding_init=nn.initializers.normal(0.02),
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        self.blocks = [ResidualAttentionBlock(self.width, self.heads,
                                              dtype=self.dtype,
                                              name=f"block_{i}")
                       for i in range(self.layers)]
        self.ln_final = LayerNormF32()
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: (B, T) int32 (T <= context_length) -> (B, embed_dim)."""
        t = tokens.shape[1]
        x = self.token_embedding(tokens).astype(self.dtype)
        x = x + self.positional_embedding[:t].astype(x.dtype)
        for blk in self.blocks:
            x = blk(x, causal=True)
        x = self.ln_final(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection.astype(pooled.dtype)


class CLIP(nn.Module):
    """Full CLIP. Method-dispatched apply:

    ``model.apply(vars, pixels, method='encode_image')``,
    ``model.apply(vars, pixels, method='get_patch_encodings')``,
    ``model.apply(vars, tokens, method='encode_text')``.
    """

    embed_dim: int
    # vision
    image_resolution: int
    vision_layers: int
    vision_width: int
    vision_patch_size: int
    # text
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int
    vision_heads: Optional[int] = None  # default: width // 64 (OpenAI rule)
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    def setup(self):
        self.visual = CLIPVisionTransformer(
            width=self.vision_width, layers=self.vision_layers,
            heads=self.vision_heads or self.vision_width // 64,
            patch_size=self.vision_patch_size,
            embed_dim=self.embed_dim, image_resolution=self.image_resolution,
            dtype=self.dtype, use_flash=self.use_flash, name="visual")
        self.text = CLIPTextTransformer(
            width=self.transformer_width, layers=self.transformer_layers,
            heads=self.transformer_heads, vocab_size=self.vocab_size,
            context_length=self.context_length, embed_dim=self.embed_dim,
            dtype=self.dtype, name="text")
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, 2.6592), ())

    def encode_image(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self.visual(pixels)

    def get_patch_encodings(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self.visual(pixels, patch_output=True)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.text(tokens)

    def __call__(self, pixels: jnp.ndarray, tokens: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Contrastive logits (reference model.py:428-443)."""
        img = self.encode_image(pixels)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale).astype(img.dtype)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


# Canonical teacher configs (reference clip.py:_MODELS + preprocess_data.py
# :688-698 uses ViT-L/14@336px).
CLIP_CONFIGS = {
    "ViT-B/32": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=32,
                     context_length=77, vocab_size=49408, transformer_width=512,
                     transformer_heads=8, transformer_layers=12),
    "ViT-B/16": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=16,
                     context_length=77, vocab_size=49408, transformer_width=512,
                     transformer_heads=8, transformer_layers=12),
    "ViT-L/14": dict(embed_dim=768, image_resolution=224, vision_layers=24,
                     vision_width=1024, vision_patch_size=14,
                     context_length=77, vocab_size=49408, transformer_width=768,
                     transformer_heads=12, transformer_layers=12),
    "ViT-L/14@336px": dict(embed_dim=768, image_resolution=336, vision_layers=24,
                           vision_width=1024, vision_patch_size=14,
                           context_length=77, vocab_size=49408,
                           transformer_width=768, transformer_heads=12,
                           transformer_layers=12),
    # random-weights smoke config for pipeline tests (not a real teacher)
    "tiny-test": dict(embed_dim=16, image_resolution=32, vision_layers=2,
                      vision_width=64, vision_patch_size=16,
                      context_length=77, vocab_size=49408,
                      transformer_width=32, transformer_heads=4,
                      transformer_layers=2),
}


def build_clip(name: str, dtype: Dtype = jnp.float32,
               use_flash: Optional[bool] = None) -> CLIP:
    if name not in CLIP_CONFIGS:
        raise ValueError(f"unknown CLIP config {name!r}; "
                         f"have {sorted(CLIP_CONFIGS)}")
    if use_flash is None:
        import jax as _jax

        use_flash = _jax.default_backend() == "tpu"
    return CLIP(dtype=dtype, use_flash=use_flash, **CLIP_CONFIGS[name])
