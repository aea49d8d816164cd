"""Frozen 2D teacher models (CLIP, DINOv2) as JAX/flax forward passes."""

from .clip import CLIP, CLIPTextTransformer, CLIPVisionTransformer  # noqa: F401
