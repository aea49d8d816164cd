"""One-shot Pallas TPU attention for moderate sequence lengths.

Built for the CLIP ViT teacher's hot shape — (B=96, H=16, T=769, D=64)
bf16 during obj-prior extraction (reference runs xformers
memory_efficient_attention here, models/features/dino/layers/
attention.py:70-89; the CLIP towers use torch MHA). At ViT lengths the
whole (Tq, Tk) score matrix fits VMEM, so one program per (batch, head)
computes QK^T -> masked softmax -> PV in a single pass — no online
(flash) softmax, no multi-pass rescaling. Measured on v5e at the hot
shape: 19.6 TF/s (vs 13.0 for the tuned flash kernel, 13.6-13.9 for
jax.nn.dot_product_attention, and 17.0 for this kernel's earlier naive
softmax — the kernel is VPU-instruction-bound, so trimming full-matrix
elementwise passes is what moves it; see _kernel). Matches the XLA
reference to one bf16 ulp (max abs err 2^-8 at unit-scale outputs).
Restructurings measured NOT to help: denominator-in-matmul,
2 heads/program, bf16 score storage; see PERF.md.

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
    # The kernel is VPU-bound (PERF.md: the MXU matmuls are ~12% of the
    # 17 TF/s baseline's time), so every full-(Tq,Tk)-matrix elementwise
    # pass counts. Three reductions vs the naive form:
    #   - key-pad masking + the softmax scale fold into ONE fma pass:
    #     sm = s * (scale*log2e) + bias, with bias a (1, Tk) row of
    #     0 / -inf (iota over a row vector, not the full matrix);
    #   - exp2 instead of exp (exp lowers to exp2 + a multiply; the
    #     multiply is now inside the fma);
    #   - the softmax denominator divides the (Tq, D) OUTPUT instead of
    #     the (Tq, Tk) score matrix (unnormalized probs lie in (0, 1]
    #     after max-subtraction — same relative precision at bf16).
    c = scale * 1.4426950408889634  # log2(e): exp(x*scale) == exp2(x*c)
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    bias = jnp.where(col < t, 0.0, -jnp.inf)  # (1, Tk) row, broadcast below
    sm = s * c + bias
    m = jnp.max(sm, axis=-1, keepdims=True)
    e = jnp.exp2(sm - m)
    den = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(e.astype(q_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o * (1.0 / den)).astype(o_ref.dtype)


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
