"""Sparse convolution primitives: gather → GEMM → accumulate.

TPU-native replacement for MinkowskiEngine's CUDA gather-GEMM-scatter
convolutions (every ``ME.MinkowskiConvolution[Transpose]`` in reference
models/distil/minkunet.py). Design notes:

- A sparse conv with kernel map ``nbr (K, M_out)`` is ``out = Σ_k
  feats[nbr[k]] @ W[k]`` — K row-gathers feeding K MXU matmuls, run under
  ``lax.scan`` so peak memory stays at one gathered block while XLA
  pipelines gather(k+1) against matmul(k).
- Misses/padding index row ``M_in``; a zero row is appended so they
  contribute nothing (branch-free).
- The transposed k2s2 conv computes ``H_o = feats @ W[o]`` on the *coarse*
  side (8 small matmuls) and then gathers ``H[offset(i), parent(i)]`` per
  fine voxel — strictly less FLOPs than the naive per-fine-voxel one-hot
  form whenever the coarse level is smaller, which it always is.
- Everything is shaped (B, M, C); vmap over the batch happens here, so
  batch norm above this layer still sees the whole global batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_zero_row(x: jnp.ndarray) -> jnp.ndarray:
    """Append one zero row: gather index M becomes a no-op contribution."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0)


def gather_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather with the zero-padding-row convention.

    feats: (M, C) [or (B, M, C)], idx: (...,) [or (B, ...)] with value M
    meaning 'miss -> zeros'.
    """
    if feats.ndim == 3:
        return jax.vmap(gather_rows)(feats, idx)
    return jnp.take(_pad_zero_row(feats), idx, axis=0)


def _sparse_conv_single(feats: jnp.ndarray, nbr_map: jnp.ndarray,
                        weights: jnp.ndarray) -> jnp.ndarray:
    """(M_in, Cin) x (K, M_out) x (K, Cin, Cout) -> (M_out, Cout)."""
    fp = _pad_zero_row(feats)
    m_out = nbr_map.shape[1]
    c_out = weights.shape[-1]

    def step(acc, kv):
        idx, w = kv
        g = jnp.take(fp, idx, axis=0)  # (M_out, Cin)
        return acc + jnp.dot(g, w, preferred_element_type=acc.dtype), None

    init = jnp.zeros((m_out, c_out), dtype=jnp.promote_types(feats.dtype, jnp.float32))
    acc, _ = jax.lax.scan(step, init, (nbr_map, weights))
    return acc.astype(feats.dtype)


def sparse_conv(feats: jnp.ndarray, nbr_map: jnp.ndarray, weights: jnp.ndarray,
                out_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sparse convolution over a precomputed kernel map.

    feats: (B, M_in, Cin) or (M_in, Cin); nbr_map: (B, K, M_out) or (K, M_out)
    weights: (K, Cin, Cout) — ME kernel layout.

    Covers stride-1 convs (nbr_map = same-level neighbor map) *and* stride-2
    down-convs (nbr_map = down_map into the finer level). A 1x1x1 conv is
    the K=1 case (identity map), but prefer a plain matmul for that.
    """
    if feats.ndim == 3:
        out = jax.vmap(_sparse_conv_single, in_axes=(0, 0, None))(
            feats, nbr_map, weights)
    else:
        out = _sparse_conv_single(feats, nbr_map, weights)
    if out_mask is not None:
        out = out * out_mask[..., None].astype(out.dtype)
    return out


def _sparse_conv_transpose_single(coarse_feats: jnp.ndarray,
                                  up_parent: jnp.ndarray,
                                  up_offset: jnp.ndarray,
                                  weights: jnp.ndarray) -> jnp.ndarray:
    """(Mc, Cin) -> (Mf, Cout) via parent gather of precomputed H_o."""
    k = weights.shape[0]
    mc = coarse_feats.shape[0]
    # H: (K, Mc, Cout) = all offset-projected coarse features.
    h = jnp.einsum("mc,kcd->kmd", coarse_feats, weights,
                   preferred_element_type=jnp.float32).astype(coarse_feats.dtype)
    h = h.reshape(k * mc, -1)
    h = jnp.concatenate([h, jnp.zeros((1, h.shape[-1]), h.dtype)], axis=0)
    flat = jnp.where(up_parent >= mc, k * mc,
                     up_offset * mc + jnp.minimum(up_parent, mc - 1))
    return jnp.take(h, flat, axis=0)


def sparse_conv_transpose(coarse_feats: jnp.ndarray, up_parent: jnp.ndarray,
                          up_offset: jnp.ndarray, weights: jnp.ndarray,
                          out_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Transposed k2s2 sparse conv: coarse level -> the encoder's fine level.

    weights: (8, Cin, Cout); fine voxel i receives W[offset(i)]ᵀ-projected
    features of its parent (reference ME.MinkowskiConvolutionTranspose with
    kernel 2 stride 2, minkunet.py:81-104).
    """
    if coarse_feats.ndim == 3:
        out = jax.vmap(_sparse_conv_transpose_single, in_axes=(0, 0, 0, None))(
            coarse_feats, up_parent, up_offset, weights)
    else:
        out = _sparse_conv_transpose_single(coarse_feats, up_parent, up_offset,
                                            weights)
    if out_mask is not None:
        out = out * out_mask[..., None].astype(out.dtype)
    return out
