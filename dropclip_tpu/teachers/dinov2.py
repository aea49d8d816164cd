"""DINOv2 vision transformer in flax (optional second teacher).

Fresh implementation of the architecture the reference vendors from Meta
(reference models/features/dino/dinov2_vit_extractor.py:42-416 and
dino/layers/*): patch embed (s14, with bias) + cls token, additive
position embeddings with bicubic interpolation for non-native sizes,
pre-norm blocks with LayerScale on both branches, exact-GELU MLP, final
LayerNorm. Exposes the reference featurizer API
(``DINOv2Featurizer.get_cls_token/get_patch_tokens``,
dinov2_vit_extractor.py:439-483). The reference's xformers
memory-efficient attention (dino/layers/attention.py:70-89) maps to the
same fused dot-product attention XLA emits from einsum on TPU.

Weights convert from HuggingFace ``Dinov2Model`` state dicts (the public
distribution; reference torch.hub-loads Meta's checkpoints — identical
tensors, different naming).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bicubic_resize

DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)


class Attention(nn.Module):
    heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        hd = d // self.heads
        qp = nn.Dense(d, dtype=self.dtype, name="query")(x)
        kp = nn.Dense(d, dtype=self.dtype, name="key")(x)
        vp = nn.Dense(d, dtype=self.dtype, name="value")(x)
        if self.use_flash:
            from ..core.platform import env_flag
            from ..ops.attention import (flash_attention_padded,
                                         oneshot_attention,
                                         oneshot_attention_packed, supports,
                                         supports_packed)

            # packed layout consumes the projection outputs directly —
            # no (B,T,H,D) transposes around the kernel (hardware A/B on
            # the CLIP tower: 580 -> 429 ms per 96-crop chunk, PERF.md)
            if (supports_packed(t, self.heads, hd, causal=False,
                                itemsize=qp.dtype.itemsize)
                    and env_flag("DROPCLIP_PACKED_ATTN", default=True)):
                out = oneshot_attention_packed(qp, kp, vp, self.heads)
                return nn.Dense(d, dtype=self.dtype, name="out")(out)
        q = qp.reshape(b, t, self.heads, hd)
        k = kp.reshape(b, t, self.heads, hd)
        v = vp.reshape(b, t, self.heads, hd)
        if self.use_flash:
            if supports(t, hd, causal=False, itemsize=q.dtype.itemsize):
                out = oneshot_attention(q, k, v).reshape(b, t, d)
            else:
                # hi-res grids (518px/14 -> 1370 tokens and beyond):
                # tiled flash instead of a materialized (B, h, t, t)
                out = flash_attention_padded(q, k, v).reshape(b, t, d)
            return nn.Dense(d, dtype=self.dtype, name="out")(out)
        logits = jnp.einsum("bqhc,bkhc->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhc->bqhc", probs, v).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class Block(nn.Module):
    heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    use_flash: bool = False
    # "mlp" (S/B/L) or "swiglu" (the giant uses SwiGLUFFNFused — reference
    # dinov2_vit_extractor.py:406-416 / dino/layers/swiglu_ffn.py)
    ffn: str = "mlp"

    @nn.compact
    def __call__(self, x: jnp.ndarray, delta: jnp.ndarray = None,
                 fused: bool = False):
        d = x.shape[-1]
        ls1 = self.param("ls1", nn.initializers.ones, (d,))
        ls2 = self.param("ls2", nn.initializers.ones, (d,))
        if fused:
            # fused residual stream (see clip.ResidualAttentionBlock
            # .fused_call): logical input is x + delta; each add+LN pair
            # is one add_layer_norm pass. LayerNormF32 creates the same
            # {scale, bias} params under the same names as nn.LayerNorm,
            # so checkpoints are interchangeable between the two paths.
            from .clip import LayerNormF32

            ln1 = LayerNormF32(epsilon=1e-6, name="norm1")
            if delta is None:
                s, h = x, ln1(x)
            else:
                s, h = ln1(x, delta)
            a = Attention(self.heads, dtype=self.dtype,
                          use_flash=self.use_flash,
                          name="attn")(h) * ls1.astype(s.dtype)
            s, h = LayerNormF32(epsilon=1e-6, name="norm2")(s, a)
        else:
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
            x = x + Attention(self.heads, dtype=self.dtype,
                              use_flash=self.use_flash,
                              name="attn")(h) * ls1.astype(x.dtype)
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        if self.ffn == "swiglu":
            # hidden = 8-aligned 2/3 of the MLP width (SwiGLUFFNFused)
            hidden = (int(int(d * self.mlp_ratio) * 2 / 3) + 7) // 8 * 8
            h12 = nn.Dense(2 * hidden, dtype=self.dtype, name="w12")(h)
            x1, x2 = h12[..., :hidden], h12[..., hidden:]
            h = jax.nn.silu(x1.astype(jnp.float32)).astype(self.dtype) * x2
            h = nn.Dense(d, dtype=self.dtype, name="w3")(h)
        else:
            h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                         name="fc1")(h)
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
                self.dtype)
            h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        if fused:
            return s, h * ls2.astype(s.dtype)
        return x + h * ls2.astype(x.dtype)


class DinoV2ViT(nn.Module):
    """__call__(pixels NHWC normalized) -> (cls (B, D), patches (B, h, w, D))."""

    width: int = 384
    layers: int = 12
    heads: int = 6
    patch_size: int = 14
    image_resolution: int = 518
    mlp_ratio: float = 4.0
    ffn: str = "mlp"  # "swiglu" for the giant (SwiGLUFFNFused)
    dtype: Any = jnp.float32
    use_flash: bool = False  # one-shot VMEM attention kernel on TPU
    # (ops/attention.py; same auto-switch as the CLIP teacher)

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = pixels.shape
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype,
                    name="patch_embed")(pixels.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.width))
        pe = self.param("pos_embed", nn.initializers.normal(0.02),
                        (1, (self.image_resolution // self.patch_size) ** 2 + 1,
                         self.width))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype),
                                              (b, 1, self.width)), x], axis=1)
        x = x + self._interp_pos(pe, gh, gw).astype(x.dtype)
        from ..core.platform import env_flag

        if env_flag("DROPCLIP_FUSED_ADD_LN"):
            res, delta = x, None
            for i in range(self.layers):
                res, delta = Block(self.heads, self.mlp_ratio,
                                   dtype=self.dtype,
                                   use_flash=self.use_flash, ffn=self.ffn,
                                   name=f"block_{i}")(res, delta, fused=True)
            x = res + delta
        else:
            for i in range(self.layers):
                x = Block(self.heads, self.mlp_ratio, dtype=self.dtype,
                          use_flash=self.use_flash, ffn=self.ffn,
                          name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x[:, 0], x[:, 1:].reshape(b, gh, gw, self.width)

    def _interp_pos(self, pe: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        og = self.image_resolution // self.patch_size
        if gh == og and gw == og:
            return pe
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        resized = bicubic_resize(
            patch_pe.reshape(og, og, self.width), (gh, gw))
        return jnp.concatenate(
            [cls_pe, resized.reshape(1, gh * gw, self.width)], axis=1)


DINOV2_CONFIGS = {
    "dinov2_vits14": dict(width=384, layers=12, heads=6),
    "dinov2_vitb14": dict(width=768, layers=12, heads=12),
    "dinov2_vitl14": dict(width=1024, layers=24, heads=16),
    "dinov2_vitg14": dict(width=1536, layers=40, heads=24, ffn="swiglu"),
    "tiny-test": dict(width=64, layers=2, heads=4, image_resolution=28),
}


def build_dinov2(name: str, dtype=jnp.float32, use_flash=None) -> DinoV2ViT:
    if name not in DINOV2_CONFIGS:
        raise ValueError(f"unknown DINOv2 config {name!r}")
    if use_flash is None:
        import jax as _jax

        use_flash = _jax.default_backend() == "tpu"
    return DinoV2ViT(dtype=dtype, use_flash=use_flash,
                     **DINOV2_CONFIGS[name])


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def from_hf_dinov2(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """HuggingFace ``Dinov2Model.state_dict()`` -> DinoV2ViT params."""
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.layer."))
    lin = lambda p: {"kernel": _np(sd[f"{p}.weight"]).T,
                     "bias": _np(sd[f"{p}.bias"])}
    ln = lambda p: {"scale": _np(sd[f"{p}.weight"]),
                    "bias": _np(sd[f"{p}.bias"])}
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _np(sd["embeddings.patch_embeddings.projection.weight"]
                          ).transpose(2, 3, 1, 0),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"])},
        "cls_token": _np(sd["embeddings.cls_token"]),
        "pos_embed": _np(sd["embeddings.position_embeddings"]),
        "norm": ln("layernorm"),
    }
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        params[f"block_{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "ls1": _np(sd[f"{p}.layer_scale1.lambda1"]),
            "ls2": _np(sd[f"{p}.layer_scale2.lambda1"]),
            "attn": {"query": lin(f"{p}.attention.attention.query"),
                     "key": lin(f"{p}.attention.attention.key"),
                     "value": lin(f"{p}.attention.attention.value"),
                     "out": lin(f"{p}.attention.output.dense")},
        }
        if f"{p}.mlp.weights_in.weight" in sd:  # giant: use_swiglu_ffn
            params[f"block_{i}"]["w12"] = lin(f"{p}.mlp.weights_in")
            params[f"block_{i}"]["w3"] = lin(f"{p}.mlp.weights_out")
        else:
            params[f"block_{i}"]["fc1"] = lin(f"{p}.mlp.fc1")
            params[f"block_{i}"]["fc2"] = lin(f"{p}.mlp.fc2")
    return params


class Dinov2Extractor:
    """Featurizer API over DinoV2ViT (reference extractor.py:184-232 and
    dinov2_vit_extractor.py:439-483): cls or patch mode, DINO
    normalization, batched."""

    def __init__(self, model: DinoV2ViT, variables, mode: str = "patch",
                 img_resize: Tuple[int, int] = (336, 448),
                 batch_size: int = 32):
        from .prompting import normalize, resize_image

        self.model = model
        self.variables = variables
        self.img_resize = tuple(img_resize)
        self.batch_size = batch_size
        self.set_mode(mode)

        @jax.jit
        def _fwd(variables, images):
            x = resize_image(images.astype(jnp.float32), self.img_resize)
            x = normalize(x / 255.0, DINO_MEAN, DINO_STD)
            return self.model.apply(variables, x)

        self._fwd = _fwd

    def set_mode(self, mode: str) -> None:
        if mode not in ("cls", "patch"):
            raise ValueError("Set mode to either ['cls', 'patch']")
        self.mode = mode

    def get_cls_token(self, images) -> jnp.ndarray:
        return self._run(images)[0]

    def get_patch_tokens(self, images) -> jnp.ndarray:
        return self._run(images)[1]

    def extract(self, images) -> jnp.ndarray:
        out = self._run(images)
        return out[0] if self.mode == "cls" else out[1]

    def _run(self, images):
        images = jnp.asarray(images)
        cls_out, patch_out = [], []
        for i in range(0, images.shape[0], self.batch_size):
            c, p = self._fwd(self.variables, images[i: i + self.batch_size])
            cls_out.append(c)
            patch_out.append(p)
        return jnp.concatenate(cls_out), jnp.concatenate(patch_out)
