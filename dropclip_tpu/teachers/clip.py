"""CLIP (ViT + RN vision towers, text transformer) as flax modules, TPU-first.

Fresh implementation of the architecture the reference vendors
(reference models/features/clip/model.py:12-440 — a tuple ``vision_layers``
selects the ModifiedResNet tower with attention pooling, an int the ViT,
same dispatch as build_model :469-483), with the two extensions the
DROP-CLIP pipeline depends on:

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

from ..ops.attention import flash_attention_padded as _flash_attention
from ..ops.resize import bicubic_resize

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation (model.py:190-192)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _gemm_ln_barrier(x: jnp.ndarray) -> jnp.ndarray:
    """Fusion fence between a sublayer's output projection and the
    residual-add + next-LN stats (A/B knob: DROPCLIP_SPLIT_GEMM_LN).

    Measured a WASH on hardware (433 vs 428 ms on the 96-crop ViT-L
    chunk): the fat `convert_reduce_fusion`s XLA builds here LOOK like
    slow LN ops in a profile, but they contain the out_proj/c_proj GEMMs
    running near roofline — fencing just relabels the time
    (convert_reduce 206 -> 32 ms while convolution_add grows 65 -> 162
    and %fusion 8 -> 96). Total GEMM FLOPs (~44.5 TF/chunk ≈ 320 ms at
    the measured MXU rate) + the VPU-bound attention (105 ms) account
    for the whole chunk: the teacher is AT its envelope. Kept off by
    default; useful for profile attribution (it splits LN time from GEMM
    time honestly)."""
    from ..core.platform import env_flag

    if env_flag("DROPCLIP_SPLIT_GEMM_LN"):
        return jax.lax.optimization_barrier(x)
    return x


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32, result cast back to the input dtype
    (parity with the reference's fp16-safe LayerNorm, model.py:180-187).

    On TPU this runs as a Pallas kernel (ops/layernorm.py): XLA's own
    residual-add+LN fusions measure ~3x the VPU floor at the ViT-L hot
    shape and were 33% of the whole teacher forward (PERF.md)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, delta: jnp.ndarray = None):
        """LN(x), or — with ``delta`` — the fused residual form
        ``(x + delta, LN(x + delta))`` in one HBM pass (add_layer_norm)."""
        from ..ops.layernorm import add_layer_norm, layer_norm

        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if delta is not None:
            return add_layer_norm(x, delta, scale, bias, eps=self.epsilon)
        return layer_norm(x, scale, bias, eps=self.epsilon)


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
        from ..core.platform import env_flag

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
            # kernel were ~150 ms of the 571 ms ViT-L teacher chunk.
            # Hardware A/B (PERF.md): 580 -> 429 ms on the 96-crop chunk,
            # bit-identical outputs — default ON (DROPCLIP_PACKED_ATTN=0
            # restores the per-head kernel); per-head one-shot and flash
            # remain as fallbacks for unsupported shapes
            if (supports_packed(t, self.heads, hd, causal,
                                itemsize=qp.dtype.itemsize)
                    and env_flag("DROPCLIP_PACKED_ATTN", default=True)):
                return self.out_proj(
                    oneshot_attention_packed(qp, kp, vp, self.heads))
        q = qp.reshape(b, t, self.heads, hd)
        k = kp.reshape(b, t, self.heads, hd)
        v = vp.reshape(b, t, self.heads, hd)
        if self.use_flash:
            # one-shot VMEM kernel beats both flash and XLA dpa at ViT
            # lengths (17.0 vs 13.0 / 13.6 TF/s at T=769, see PERF.md);
            # flash remains for causal (text tower) and long sequences
            if supports(t, hd, causal, itemsize=q.dtype.itemsize):
                out = oneshot_attention(q, k, v)
            else:
                out = _flash_attention(q, k, v, causal)
        else:
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
        x = x + _gemm_ln_barrier(self.attn(self.ln_1(x), causal=causal))
        return x + _gemm_ln_barrier(
            self.c_proj(quick_gelu(self.c_fc(self.ln_2(x)))))

    def fused_call(self, res: jnp.ndarray, delta, causal: bool = False):
        """Fused-stream form: the logical input is ``res + delta`` (delta
        None for the first block); each residual add rides inside the next
        add_layer_norm pass instead of a standalone HBM round trip. The
        caller finishes with one plain add of the returned pair."""
        if delta is None:
            s, y = res, self.ln_1(res)
        else:
            s, y = self.ln_1(res, delta)
        s, y = self.ln_2(s, self.attn(y, causal=causal))
        return s, self.c_proj(quick_gelu(self.c_fc(y)))

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

    def _run_blocks(self, x: jnp.ndarray, blocks) -> jnp.ndarray:
        from ..core.platform import env_flag

        if env_flag("DROPCLIP_FUSED_ADD_LN"):
            # fused residual stream: each add+LN pair is one Pallas pass
            # (ops/layernorm.add_layer_norm); only the loop-closing add
            # remains a plain elementwise op
            res, delta = x, None
            for blk in blocks:
                res, delta = blk.fused_call(res, delta)
            return res + delta
        for blk in blocks:
            x = blk(x)
        return x

    def __call__(self, pixels: jnp.ndarray,
                 patch_output: bool = False) -> jnp.ndarray:
        x = self._embed(pixels)
        if patch_output:
            x = self._run_blocks(x, self.blocks[:-1])
            x = self.blocks[-1].forward_v(x)
            x = self.ln_post(x[:, 1:, :])
            return x @ self.proj.astype(x.dtype)
        x = self._run_blocks(x, self.blocks)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj.astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d with running stats held as plain params
    (the CLIP teachers are frozen — reference never trains them — so the
    torch train/eval moment machinery collapses to an affine transform).
    Computed in float32 like LayerNormF32."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class BottleneckRN(nn.Module):
    """CLIP's anti-aliased ResNet bottleneck: all convs stride 1, an
    avgpool after conv2 when stride > 1, and the downsample branch
    prepended with an avgpool (reference model.py:12-57)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inplanes = x.shape[-1]
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=((k // 2, k // 2),) * 2, use_bias=False,
            dtype=self.dtype, name=name)
        y = jax.nn.relu(FrozenBatchNorm(name="bn1")(
            conv(self.planes, 1, "conv1")(x)))
        y = jax.nn.relu(FrozenBatchNorm(name="bn2")(
            conv(self.planes, 3, "conv2")(y)))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride,) * 2, strides=(self.stride,) * 2)
        y = FrozenBatchNorm(name="bn3")(conv(self.planes * 4, 1, "conv3")(y))
        if self.stride > 1 or inplanes != self.planes * 4:
            idn = (nn.avg_pool(x, (self.stride,) * 2,
                               strides=(self.stride,) * 2)
                   if self.stride > 1 else x)
            idn = FrozenBatchNorm(name="downsample_bn")(
                conv(self.planes * 4, 1, "downsample_conv")(idn))
        else:
            idn = x
        return jax.nn.relu(y + idn)


class AttentionPool2d(nn.Module):
    """QKV attention pool: query = mean token, plus the MaskCLIP value
    path ``forward_v`` for dense per-patch features (reference
    model.py:60-114)."""

    spacial_dim: int
    embed_dim: int
    heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim))
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        self.q_proj = dense(self.embed_dim, "q_proj")
        self.k_proj = dense(self.embed_dim, "k_proj")
        self.v_proj = dense(self.embed_dim, "v_proj")
        self.c_proj = dense(self.output_dim, "c_proj")

    def _tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        return jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)

    def _pos_embed(self, gh: int, gw: int) -> jnp.ndarray:
        """Bicubic pos-embed resampling for forward_v, DINO +0.1 trick
        (reference interpolate.py:5-54 with patch_size=1). NOTE: the
        reference call site unpacks NCHW as ``_, _, w, h`` (model.py:101-104)
        so its non-square grids come out transposed; we interpolate in the
        true (h, w) orientation (identical for square inputs — and the RN
        forward_v path is never exercised non-square by any pipeline)."""
        og = self.spacial_dim
        pe = self.positional_embedding
        if gh == og and gw == og:
            return pe
        resized = bicubic_resize(
            pe[1:].reshape(og, og, self.embed_dim), (gh, gw),
            scale_hw=((gh + 0.1) / og, (gw + 0.1) / og))
        return jnp.concatenate(
            [pe[:1], resized.reshape(-1, self.embed_dim)], axis=0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, h, w, C) -> (B, output_dim) pooled features. Like the
        reference (:72-96), the UNinterpolated embedding is added — the
        cls path requires the training grid."""
        b, h, w, _ = x.shape
        if h * w != self.spacial_dim ** 2:
            raise ValueError(
                f"AttentionPool2d cls path needs the {self.spacial_dim}^2 "
                f"training grid, got {h}x{w} (reference model.py:75 "
                "shape-errors identically); use patch_output for other sizes")
        t = self._tokens(x) + self.positional_embedding.astype(x.dtype)
        hd = self.embed_dim // self.heads
        q = self.q_proj(t[:, :1]).reshape(b, 1, self.heads, hd)
        k = self.k_proj(t).reshape(b, -1, self.heads, hd)
        v = self.v_proj(t).reshape(b, -1, self.heads, hd)
        out = jax.nn.dot_product_attention(q, k, v)
        return self.c_proj(out.reshape(b, 1, self.embed_dim))[:, 0]

    def forward_v(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, h, w, C) -> (B, hw+1, output_dim): c_proj(v_proj(tokens))
        with the interpolated positional embedding (reference :98-114)."""
        t = self._tokens(x)
        t = t + self._pos_embed(x.shape[1], x.shape[2]).astype(t.dtype)
        return self.c_proj(self.v_proj(t))


class ModifiedResNet(nn.Module):
    """CLIP's RN tower: 3-conv stem with avgpool, anti-aliased strided
    bottlenecks, attention pooling; ``patch_output`` returns the MaskCLIP
    value-path per-patch features (reference model.py:117-180)."""

    layers: Tuple[int, ...]
    output_dim: int
    heads: int
    input_resolution: int
    width: int
    dtype: Dtype = jnp.float32

    def setup(self):
        w = self.width
        conv3 = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=s, padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name=name)
        self.conv1 = conv3(w // 2, 2, "conv1")
        self.bn1 = FrozenBatchNorm(name="bn1")
        self.conv2 = conv3(w // 2, 1, "conv2")
        self.bn2 = FrozenBatchNorm(name="bn2")
        self.conv3 = conv3(w, 1, "conv3")
        self.bn3 = FrozenBatchNorm(name="bn3")
        blocks = []
        for j, (planes, n) in enumerate(
                zip((w, w * 2, w * 4, w * 8), self.layers)):
            stage = []
            for i in range(n):
                stride = 2 if (i == 0 and j > 0) else 1
                stage.append(BottleneckRN(planes, stride, dtype=self.dtype,
                                          name=f"layer{j + 1}_{i}"))
            blocks.append(stage)
        self.stages = blocks
        self.attnpool = AttentionPool2d(
            self.input_resolution // 32, w * 32, self.heads,
            self.output_dim, dtype=self.dtype, name="attnpool")

    def __call__(self, pixels: jnp.ndarray,
                 patch_output: bool = False) -> jnp.ndarray:
        x = pixels.astype(self.dtype)
        x = jax.nn.relu(self.bn1(self.conv1(x)))
        x = jax.nn.relu(self.bn2(self.conv2(x)))
        x = jax.nn.relu(self.bn3(self.conv3(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for stage in self.stages:
            for blk in stage:
                x = blk(x)
        if patch_output:
            # no ln_post/proj for RN — c_proj already maps to output_dim
            return self.attnpool.forward_v(x)[:, 1:, :]
        return self.attnpool(x)


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
        from ..core.platform import env_flag

        t = tokens.shape[1]
        x = self.token_embedding(tokens).astype(self.dtype)
        x = x + self.positional_embedding[:t].astype(x.dtype)
        if env_flag("DROPCLIP_FUSED_ADD_LN"):
            res, delta = x, None
            for blk in self.blocks:
                res, delta = blk.fused_call(res, delta, causal=True)
            x = res + delta
        else:
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
    # vision: an int layer count selects the ViT tower; a tuple of 4 stage
    # depths selects the RN tower (same dispatch as reference build_model,
    # model.py:469-483)
    image_resolution: int
    vision_layers: Any
    vision_width: int
    vision_patch_size: int  # RN: the effective output stride (32)
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
        if isinstance(self.vision_layers, (tuple, list)):
            self.visual = ModifiedResNet(
                layers=tuple(self.vision_layers), output_dim=self.embed_dim,
                heads=self.vision_heads or (self.vision_width * 32 // 64),
                input_resolution=self.image_resolution,
                width=self.vision_width, dtype=self.dtype, name="visual")
        else:
            self.visual = CLIPVisionTransformer(
                width=self.vision_width, layers=self.vision_layers,
                heads=self.vision_heads or self.vision_width // 64,
                patch_size=self.vision_patch_size,
                embed_dim=self.embed_dim,
                image_resolution=self.image_resolution,
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
    # RN towers (reference clip.py:29-39 _MODELS; hyperparameters as
    # build_model infers them from the checkpoints, model.py:469-483).
    # vision_patch_size = the effective output stride.
    "RN50": dict(embed_dim=1024, image_resolution=224,
                 vision_layers=(3, 4, 6, 3), vision_width=64,
                 vision_patch_size=32, context_length=77, vocab_size=49408,
                 transformer_width=512, transformer_heads=8,
                 transformer_layers=12),
    "RN101": dict(embed_dim=512, image_resolution=224,
                  vision_layers=(3, 4, 23, 3), vision_width=64,
                  vision_patch_size=32, context_length=77, vocab_size=49408,
                  transformer_width=512, transformer_heads=8,
                  transformer_layers=12),
    "RN50x4": dict(embed_dim=640, image_resolution=288,
                   vision_layers=(4, 6, 10, 6), vision_width=80,
                   vision_patch_size=32, context_length=77, vocab_size=49408,
                   transformer_width=640, transformer_heads=10,
                   transformer_layers=12),
    "RN50x16": dict(embed_dim=768, image_resolution=384,
                    vision_layers=(6, 8, 18, 8), vision_width=96,
                    vision_patch_size=32, context_length=77,
                    vocab_size=49408, transformer_width=768,
                    transformer_heads=12, transformer_layers=12),
    "RN50x64": dict(embed_dim=1024, image_resolution=448,
                    vision_layers=(3, 15, 36, 10), vision_width=128,
                    vision_patch_size=32, context_length=77,
                    vocab_size=49408, transformer_width=1024,
                    transformer_heads=16, transformer_layers=12),
    # random-weights smoke configs for pipeline tests (not real teachers)
    "tiny-test-rn": dict(embed_dim=16, image_resolution=64,
                         vision_layers=(1, 1, 1, 1), vision_width=16,
                         vision_patch_size=32, context_length=77,
                         vocab_size=49408, transformer_width=32,
                         transformer_heads=4, transformer_layers=2),
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
