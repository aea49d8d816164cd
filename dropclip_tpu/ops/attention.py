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


# Per-program working-set budgets (f32 scores + input-dtype probs +
# q/k/v/out blocks, double-buffered by the pipeline), calibrated against
# Mosaic's actual compile ceiling on v5e (r2): the per-head kernel
# compiles and runs at tq=1920 (need 24.1 MB, one-shot beats flash 29.6
# vs 31.2 ms there) but fails at tq=2048 (27.3 MB); the packed kernel
# compiles at tq=1408 (13.3 MB, 31.0 ms vs flash 34.5) but fails at
# tq=1664 (18.3 MB — its head-group blocks and masked k/v copies sit on
# top of the score matrix). Budgets sit just above the verified-good
# points so mid-length sequences (hi-res DINO grids, 518 px DINOv2)
# take the faster one-shot path instead of tiled flash.
_VMEM_BUDGET = 25 * 1024 * 1024
_VMEM_BUDGET_PACKED = 14 * 1024 * 1024


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


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, *, t: int, tq: int,
                   heads: int, d: int, scale: float):
    # Same math as _kernel, but per program a GROUP of heads is sliced
    # out of a packed (Tq, G*D) block in VMEM. Padded/garbage tail rows
    # (the block may extend past T when 128 does not divide it) are
    # zeroed on k/v before the matmuls: a garbage bf16 pattern can be
    # Inf/NaN, and 0 * Inf = NaN would leak through the zero-probability
    # columns of the PV matmul.
    c = scale * 1.4426950408889634
    row = jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    keep = row < t  # (Tq, 1)
    kk = jnp.where(keep, k_ref[0], 0).astype(q_ref.dtype)
    vv = jnp.where(keep, v_ref[0], 0).astype(q_ref.dtype)
    bias = jnp.where(row.reshape(1, tq) < t, 0.0, -jnp.inf)  # (1, Tk)
    outs = []
    for h in range(heads):
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = kk[:, h * d:(h + 1) * d]
        v = vv[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        sm = s * c + bias
        m = jnp.max(sm, axis=-1, keepdims=True)
        e = jnp.exp2(sm - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(e.astype(q_ref.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append((o * (1.0 / den)).astype(o_ref.dtype))
    # one full-block store: per-head 64-lane column stores would be
    # partial-tile writes, the Mosaic clobber class documented in PERF.md
    # (equal-width concat is safe; the misplacement bug there was
    # mixed-width blocks)
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def supports_packed(t: int, heads: int, d: int, causal: bool,
                    itemsize: int = 2, group: int = 4) -> bool:
    """True if the packed-layout kernel handles this shape: the score
    matrix plus a head-group's q/k/v/out blocks must fit VMEM, head count
    divisible by the group, and D lane-tileable."""
    tq = _round_up(t, 128)
    need = (tq * tq * (4 + itemsize)            # scores f32 + probs
            + 2 * 4 * tq * group * d * itemsize)  # q/k/v/o double-buffered
    return (not causal and heads % group == 0 and d % 8 == 0
            and group * d % 128 == 0 and need <= _VMEM_BUDGET_PACKED)


def oneshot_attention_packed(q: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray, heads: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Non-causal MHA on PACKED (B, T, H*D) q/k/v — the raw projection
    matmul outputs. Numerically identical to ``oneshot_attention`` on the
    reshaped views, but the (B,T,H,D)->(B*H,T,D) transposes + pads that
    XLA materializes around the per-head kernel (measured ~150 ms of the
    571 ms ViT-L teacher chunk, PERF.md) never exist: the grid is
    (batch, head-group) and each program DMAs a strided (T, G*D) column
    block directly, masking the T tail in-kernel."""
    b, t, c = q.shape
    d = c // heads
    group = 4 if heads % 4 == 0 else (2 if heads % 2 == 0 else 1)
    tq = _round_up(t, 128)
    kern = functools.partial(_kernel_packed, t=t, tq=tq, heads=group,
                             d=d, scale=d ** -0.5)
    grid = (b, heads // group)
    spec = pl.BlockSpec((1, tq, group * d), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * tq * tq * d,
            transcendentals=b * heads * tq * tq,
            bytes_accessed=4 * b * t * c * 2),
        interpret=interpret,
    )(q, k, v)
    return out


def flash_attention_padded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           causal: bool = False) -> jnp.ndarray:
    """Pallas TPU flash attention for sequences beyond the one-shot
    kernel's VMEM budget: seq padded to 128 multiples with segment-id
    masking for the pad (the XLA attention path materializes (B, H, T, T)
    logits in HBM — the ViT-L teacher ran at ~10 TF/s on it; flash with
    full-row q blocks measures ~15 TF/s at T=769, D=64). Inputs/outputs
    are (B, T, H, D)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, t, h, d = q.shape
    tp = _round_up(t, 128)
    pad = tp - t
    qt = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    seg = jnp.concatenate([jnp.zeros((b, t), jnp.int32),
                           jnp.ones((b, pad), jnp.int32)], axis=1)
    if tp <= 1024:
        # full-row q blocks measured fastest at ViT lengths (T=769)
        bs = BlockSizes(block_q=tp, block_k_major=tp, block_k=128,
                        block_b=1, block_q_major_dkv=tp,
                        block_k_major_dkv=tp, block_q_dkv=tp,
                        block_k_dkv=128, block_q_dq=tp, block_k_dq=tp,
                        block_k_major_dq=tp)
    else:
        # hi-res sequences (stride-patched DINO v1 reaches 16k+ tokens):
        # full-row blocks would scale VMEM with T — use the library's
        # tiled defaults, which are T-independent
        bs = BlockSizes.get_default(batch_size=b, num_heads=h,
                                    q_seq_len=tp, kv_len=tp, d_model=d)
    out = flash_attention(qt, kt, vt, segment_ids=SegmentIds(q=seg, kv=seg),
                          causal=causal, sm_scale=d ** -0.5, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :t]
