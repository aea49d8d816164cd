"""Torch CLIP checkpoint -> flax params conversion.

Supports the two public weight layouts:

- **OpenAI** (the JIT checkpoints the reference downloads, reference
  models/features/clip/clip.py:98-203 / build_model model.py:469-506):
  fused ``attn.in_proj_weight`` per block, ``visual.transformer.resblocks.*``
  naming, fp16 tensors (cast to f32 here; runtime dtype is a policy).
- **HuggingFace** ``CLIPModel`` state dicts: split q/k/v projections,
  ``vision_model.encoder.layers.*`` naming.

All torch ``nn.Linear`` weights are (out, in) and flax kernels are
(in, out) -> transpose; conv kernels (out, in, kh, kw) -> (kh, kw, in, out).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _openai_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    w = _np(sd[f"{prefix}.attn.in_proj_weight"])  # (3d, d)
    b = _np(sd[f"{prefix}.attn.in_proj_bias"])
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d:2 * d], w[2 * d:]
    qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _linear(sd, f"{prefix}.attn.out_proj"),
        },
        "c_fc": _linear(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _linear(sd, f"{prefix}.mlp.c_proj"),
    }


def _rn_conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def _rn_bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"])}


def rn_visual_params(sd: Mapping[str, Any], prefix: str = "visual."
                     ) -> Dict[str, Any]:
    """torch ModifiedResNet state_dict (reference model.py:117-180) ->
    params for teachers.clip.ModifiedResNet."""
    visual: Dict[str, Any] = {}
    for name in ("conv1", "conv2", "conv3"):
        visual[name] = _rn_conv(sd, f"{prefix}{name}")
    for name in ("bn1", "bn2", "bn3"):
        visual[name] = _rn_bn(sd, f"{prefix}{name}")
    for j in range(1, 5):
        i = 0
        while f"{prefix}layer{j}.{i}.conv1.weight" in sd:
            p = f"{prefix}layer{j}.{i}"
            blk: Dict[str, Any] = {}
            for name in ("conv1", "conv2", "conv3"):
                blk[name] = _rn_conv(sd, f"{p}.{name}")
            for name in ("bn1", "bn2", "bn3"):
                blk[name] = _rn_bn(sd, f"{p}.{name}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _rn_conv(sd, f"{p}.downsample.0")
                blk["downsample_bn"] = _rn_bn(sd, f"{p}.downsample.1")
            visual[f"layer{j}_{i}"] = blk
            i += 1
    visual["attnpool"] = {
        "positional_embedding": _np(
            sd[f"{prefix}attnpool.positional_embedding"]),
        **{n: _linear(sd, f"{prefix}attnpool.{n}")
           for n in ("q_proj", "k_proj", "v_proj", "c_proj")},
    }
    return visual


def from_openai_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """OpenAI CLIP state_dict -> params for teachers.clip.CLIP (ViT and
    RN towers; dispatch mirrors build_model, reference model.py:469-483)."""
    n_txt = max(int(k.split(".")[2]) for k in sd
                if k.startswith("transformer.resblocks.")) + 1

    if "visual.attnpool.positional_embedding" in sd:
        visual: Dict[str, Any] = rn_visual_params(sd)
    else:
        n_vis = max(int(k.split(".")[3]) for k in sd
                    if k.startswith("visual.transformer.resblocks.")) + 1
        visual = {
            "conv1": {"kernel": _np(sd["visual.conv1.weight"]
                                    ).transpose(2, 3, 1, 0)},
            "class_embedding": _np(sd["visual.class_embedding"]),
            "positional_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": _np(sd["visual.proj"]),
        }
        for i in range(n_vis):
            visual[f"block_{i}"] = _openai_block(
                sd, f"visual.transformer.resblocks.{i}")

    text: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(n_txt):
        text[f"block_{i}"] = _openai_block(sd, f"transformer.resblocks.{i}")

    return {"visual": visual, "text": text,
            "logit_scale": _np(sd["logit_scale"])}


def _hf_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "ln_1": _ln(sd, f"{prefix}.layer_norm1"),
        "ln_2": _ln(sd, f"{prefix}.layer_norm2"),
        "attn": {
            "q_proj": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "c_fc": _linear(sd, f"{prefix}.mlp.fc1"),
        "c_proj": _linear(sd, f"{prefix}.mlp.fc2"),
    }


def from_hf_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """HuggingFace ``CLIPModel.state_dict()`` -> params for teachers.clip.CLIP."""
    n_vis = max(int(k.split(".")[3]) for k in sd
                if k.startswith("vision_model.encoder.layers.")) + 1
    n_txt = max(int(k.split(".")[3]) for k in sd
                if k.startswith("text_model.encoder.layers.")) + 1

    visual: Dict[str, Any] = {
        "conv1": {"kernel": _np(sd["vision_model.embeddings.patch_embedding.weight"]
                                ).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1),
        "positional_embedding": _np(
            sd["vision_model.embeddings.position_embedding.weight"]),
        # (sic) "pre_layrnorm" is HF's spelling
        "ln_pre": _ln(sd, "vision_model.pre_layrnorm"),
        "ln_post": _ln(sd, "vision_model.post_layernorm"),
        "proj": _np(sd["visual_projection.weight"]).T,
    }
    for i in range(n_vis):
        visual[f"block_{i}"] = _hf_block(sd, f"vision_model.encoder.layers.{i}")

    text: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(
            sd["text_model.embeddings.token_embedding.weight"])},
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    for i in range(n_txt):
        text[f"block_{i}"] = _hf_block(sd, f"text_model.encoder.layers.{i}")

    return {"visual": visual, "text": text,
            "logit_scale": _np(sd["logit_scale"]).reshape(())}


def load_params(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file (.pt/.pth, either layout) -> flax params.

    Handles the OpenAI JIT archives (reference clip.py:98-203 loads them via
    torch.jit; their ``state_dict()`` is the plain layout handled here).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    if any(k.startswith("vision_model.") for k in sd):
        return from_hf_state_dict(sd)
    return from_openai_state_dict(sd)


def build_clip_variables(model, checkpoint, *, context: str = "teacher"):
    """``{'params': ...}`` for a built CLIP model.

    Loads ``checkpoint`` when given; a falsy or literal ``"random"``
    checkpoint (the framework-wide smoke-mode convention,
    tools/train_distil.py) random-inits with a loud warning. Init runs at
    the model's native square resolution: param shapes don't depend on
    input size, and the RN attnpool cls path only accepts its training
    grid. Shared by the ingest extractor and the view-clip dataset arm so
    the two paths cannot drift.
    """
    import jax
    import jax.numpy as jnp

    if checkpoint and checkpoint != "random":
        return {"params": load_params(checkpoint)}
    print(f"WARNING: no CLIP checkpoint for {context}; using RANDOM "
          "teacher weights (smoke mode)")
    r = model.image_resolution
    px = jnp.zeros((1, r, r, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    return jax.jit(lambda p, t: model.init(
        jax.random.PRNGKey(0), p, t))(px, toks)
