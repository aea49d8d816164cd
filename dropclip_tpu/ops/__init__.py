"""Shared device-side kernels/ops (resize, attention, ...)."""

from .attention import (flash_attention_padded,  # noqa: F401
                        oneshot_attention, oneshot_attention_packed)
from .layernorm import add_layer_norm, layer_norm  # noqa: F401
from .resize import bicubic_resize, bilinear_resize  # noqa: F401
