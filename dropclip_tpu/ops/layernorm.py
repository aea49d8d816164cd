"""Pallas TPU LayerNorm over the minor dimension.

Built for the CLIP ViT teacher's hot shape — (96*769, 1024) bf16 during
obj-prior extraction. XLA compiles the in-model residual-add + LayerNorm
into ``convert_reduce_fusion`` ops measured at 7.9 ms each on v5e (24 of
them = 33% of the whole 96-crop ViT-L chunk; the xplane methodology and
numbers live in PERF.md). The same math standalone costs 2.5-2.8 ms —
the fusion XLA builds is ~3x slower than the VPU floor. This kernel pins
the op at the floor and lets XLA fuse the neighbouring residual adds
into matmul epilogues instead.

The kernel computes the exact two-pass mean/var in float32 like the
model's ``LayerNormF32`` (parity with the reference's fp16-safe
LayerNorm, reference models/features/clip/model.py:180-187); outputs
match the jnp path to reduction-reorder rounding (<= 1 bf16 ulp).

Inference-only (the teachers are frozen); no custom VJP. ``layer_norm``
falls back to plain jnp off-TPU or for lane-unfriendly widths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 512  # rows per program: C=1024 bf16 -> 1 MB block, 2 MB double-buffered


def _kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


def supports(c: int) -> bool:
    """Lane-friendly widths only; everything else takes the jnp path."""
    return c % 128 == 0 and c * (_ROWS + 2) * 6 < 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _pallas_ln(x2d, scale, bias, eps: float, interpret: bool):
    # No host-side pad: rows are independent, so the non-dividing tail
    # block reads unspecified rows and Pallas clips their write-back —
    # a jnp.pad here would copy the whole 75 MB activation twice per LN.
    n, c = x2d.shape
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=((n + _ROWS - 1) // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=9 * x2d.size, transcendentals=0,
            bytes_accessed=2 * x2d.size * x2d.dtype.itemsize),
        interpret=interpret,
    )(x2d, scale, bias)


_FUSED_ROWS = 256  # 4 (R, C) bf16 blocks in flight: 2 MB at C=1024


def _fused_kernel(r_ref, d_ref, s_ref, b_ref, so_ref, o_ref, *, eps: float):
    # s = res + delta in the STREAM dtype (bf16 in the teachers), exactly
    # like the in-model `x + attn(...)` add, then LN reads the requantized
    # sum — bit parity with the unfused path, one HBM pass instead of
    # XLA's three (measured 7.9 ms vs the ~2.6 ms floor, PERF.md).
    s = (r_ref[...].astype(jnp.float32)
         + d_ref[...].astype(jnp.float32)).astype(so_ref.dtype)
    so_ref[...] = s
    x = s.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


def supports_fused(c: int, itemsize: int = 2) -> bool:
    """Lane-friendly widths whose 4 in-flight blocks (res, delta, sum,
    normed) double-buffer inside VMEM."""
    return c % 128 == 0 and 4 * (_FUSED_ROWS + 2) * c * itemsize * 2 < (
        8 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _pallas_fused(r2d, d2d, scale, bias, eps: float, interpret: bool):
    n, c = r2d.shape
    return pl.pallas_call(
        functools.partial(_fused_kernel, eps=eps),
        grid=((n + _FUSED_ROWS - 1) // _FUSED_ROWS,),
        in_specs=[
            pl.BlockSpec((_FUSED_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FUSED_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_FUSED_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FUSED_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, c), r2d.dtype),
                   jax.ShapeDtypeStruct((n, c), r2d.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * r2d.size, transcendentals=0,
            bytes_accessed=4 * r2d.size * r2d.dtype.itemsize),
        interpret=interpret,
    )(r2d, d2d, scale, bias)


def add_layer_norm(res: jnp.ndarray, delta: jnp.ndarray,
                   scale: jnp.ndarray, bias: jnp.ndarray,
                   eps: float = 1e-5, interpret: bool = False):
    """``s = res + delta; y = LayerNormF32(s)`` in ONE HBM pass.

    Returns ``(s, y)`` — ``s`` feeds the next residual add, ``y`` the next
    sublayer. The residual-add + LN + convert pattern is what XLA compiles
    into its 7.9 ms ``convert_reduce_fusion``s (24x = 33% of the 96-crop
    ViT-L teacher chunk, PERF.md); the earlier 1:1 LN swap lost because the
    adds/converts stayed OUTSIDE the kernel. Opt-in on TPU via
    ``DROPCLIP_FUSED_ADD_LN`` until A/B'd end-to-end on hardware; the jnp
    fallback is bit-identical to the unfused model path."""
    from ..core.platform import env_flag

    c = res.shape[-1]
    use_pallas = supports_fused(c, res.dtype.itemsize) and (
        interpret or (env_flag("DROPCLIP_FUSED_ADD_LN")
                      and jax.default_backend() == "tpu"))
    if not use_pallas:
        s = res + delta  # stream-dtype add, exactly as the unfused model
        return s, layer_norm(s, scale, bias, eps=eps)
    lead = res.shape[:-1]
    s, y = _pallas_fused(res.reshape(-1, c), delta.reshape(-1, c),
                         scale.astype(jnp.float32),
                         bias.astype(jnp.float32), eps, interpret)
    return s.reshape(*lead, c), y.reshape(*lead, c)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """float32-computed LayerNorm over the last axis, result in x.dtype.

    Pallas on TPU for lane-friendly widths; identical-math jnp fallback
    elsewhere (CPU tests force the fallback via the backend check, and
    the kernel itself is covered in interpret mode)."""
    import os

    # Default OFF: swapping the op 1:1 into the CLIP tower MEASURED
    # SLOWER end-to-end (659 vs 571 ms device time for the 96-crop
    # ViT-L chunk) — XLA's 7.9 ms convert_reduce_fusions also cover the
    # residual adds and dtype converts, which become separate full
    # passes around an opaque kernel. Keep as opt-in + substrate for a
    # fused add+LN variant. See PERF.md "LayerNorm".
    c = x.shape[-1]
    from ..core.platform import env_flag

    use_pallas = supports(c) and (
        interpret or (env_flag("DROPCLIP_PALLAS_LN")
                      and jax.default_backend() == "tpu"))
    if not use_pallas:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        if env_flag("DROPCLIP_ONEPASS_LN"):
            # one-pass stats: E[x^2] - mean^2 lets XLA compute both
            # reductions from a single read of the activation stream
            # (the two-pass form re-reads it to center before the var
            # reduce). f32 cancellation error is ~(mean^2/var)*2^-24
            # relative — orders below the bf16 output ulp at LN scales.
            m2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        else:
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)
    lead = x.shape[:-1]
    out = _pallas_ln(x.reshape(-1, c), scale.astype(jnp.float32),
                     bias.astype(jnp.float32), eps, interpret)
    return out.reshape(*lead, c)
