"""One-shot Pallas TPU attention for moderate sequence lengths.

Built for the CLIP ViT teacher's hot shape — (B=96, H=16, T=769, D=64)
bf16 during obj-prior extraction (reference runs xformers
memory_efficient_attention here, models/features/dino/layers/
attention.py:70-89; the CLIP towers use torch MHA). At ViT lengths the
whole (Tq, Tk) score matrix fits VMEM, so one program per (batch, head)
computes QK^T -> masked softmax -> PV in a single pass — no online
(flash) softmax, no multi-pass rescaling. Measured on v5e at the hot
shape: 17.0 TF/s vs 13.0 for the tuned flash kernel and 13.6 for
jax.nn.dot_product_attention, exact (0 ulp) vs the XLA reference. The
remaining gap to the MXU roofline is VMEM traffic on the f32 score
matrix — restructuring (denominator-in-matmul, 2 heads/program) was
measured NOT to help; see PERF.md.

Shape note: all sequence dims pad to multiples of 128 (q rows padded to
a bare sublane multiple of 16 measured as a Mosaic compile hang at this
shape — do not retry); padded keys are masked to -inf before the
softmax, padded q rows produce uniform probabilities and are sliced off.

Inference-only (the teachers are frozen); no custom VJP. Falls back to
the caller's path for causal or VMEM-exceeding shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, t: int, scale: float):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / den).astype(q_ref.dtype)
    o = jax.lax.dot_general(p, v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


# conservative VMEM budget for the per-program working set (f32 scores +
# input-dtype probs + q/k/v/out blocks, double-buffered by the pipeline)
_VMEM_BUDGET = 10 * 1024 * 1024


def supports(t: int, d: int, causal: bool, itemsize: int = 2) -> bool:
    """True if the one-shot kernel handles this attention shape.

    ``itemsize``: bytes per input element (2 for bf16 — pass
    ``q.dtype.itemsize`` for other dtypes; f32 inputs nearly double the
    working set and lower the supported T cutoff)."""
    tq = tk = _round_up(t, 128)
    need = tq * tk * (4 + itemsize) + 2 * (2 * tq * d + 2 * tk * d) * itemsize
    return not causal and need <= _VMEM_BUDGET


def oneshot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Non-causal multi-head attention. q/k/v: (B, T, H, D) -> (B, T, H, D).

    Softmax over keys with padded keys masked; same contract as
    ``jax.nn.dot_product_attention(q, k, v)``.
    """
    b, t, h, d = q.shape
    tq = tk = _round_up(t, 128)

    def prep(x, tp):
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0), (0, 0))
                       ).transpose(0, 2, 1, 3).reshape(b * h, tp, d)

    qf, kf, vf = prep(q, tq), prep(k, tk), prep(v, tk)
    kern = functools.partial(_kernel, t=t, scale=d ** -0.5)
    out = pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * tq * tk * d,
            transcendentals=tq * tk,
            bytes_accessed=(2 * tq * d + 2 * tk * d) * 2 + tq * tk * 6),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)[:, :t]
