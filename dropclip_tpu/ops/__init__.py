"""Shared device-side kernels/ops (resize, attention, ...)."""

from .resize import bicubic_resize, bilinear_resize  # noqa: F401
