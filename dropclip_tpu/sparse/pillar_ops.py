"""Pillar-layout sparse conv operators (XLA formulations).

The pillar engine's op set: voxels live as full-height z-columns
(P, Z, C) at occupied (x, y) sites (see sparse/pallas_pillar.py for the
layout rationale and the fused Pallas k3 kernel these formulations are
the oracle for). This module supplies every operator a MinkUNet needs
in that layout — odd-kernel submanifold convs (k3 stages, k5 stem),
the k2s2 down conv and its transpose — as gather + shifted einsums
that XLA fuses well on TPU.

Weight layouts are reshapes of the canonical lexicographic
``(K**3, Cin, Cout)`` kernels the gather/brick engines store
(topology.kernel_offsets order: dz fastest, then dy, then dx), so the
three engines are checkpoint-compatible:

  k odd:  (K^3, C, Co) -> (K^2 xy-dirs, K dz, C, Co)   [dx-major xy]
  k2s2:   (8, C, Co)   -> (4 xy-children, 2 dz, C, Co)

Semantics match MinkowskiEngine (reference models/distil/minkunet.py
:49-126): submanifold odd convs read neighbors that exist (padded
zeros elsewhere — unoccupied voxels carry zero features by masking);
stride-2 convs write the ``unique(floor(c/2))`` site set; the
transpose reuses the encoder's fine coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pillar_conv_xla(feats: jnp.ndarray, nbr: jnp.ndarray,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """Odd-kernel submanifold conv in pillar layout.

    feats: (P, Z, C) — zero at unoccupied voxels; nbr: (P, K^2) int32
    xy-neighbor pillar rows in lexicographic (dx-major) order, miss ->
    P; weights: (K^2, K, C, Co) with dz ascending. Returns (P, Z, Co)
    UNMASKED — callers apply the occupancy mask (usually via the
    following masked batch-norm).
    """
    p, z, c = feats.shape
    k2, k = weights.shape[0], weights.shape[1]
    r = k // 2
    fz = jnp.concatenate([feats, jnp.zeros((1, z, c), feats.dtype)], axis=0)
    cols = fz[nbr]  # (P, K^2, Z, C)
    out = None
    for dzi in range(k):
        dz = dzi - r
        if dz < 0:
            sh = jnp.pad(cols[:, :, :dz], ((0, 0), (0, 0), (-dz, 0), (0, 0)))
        elif dz > 0:
            sh = jnp.pad(cols[:, :, dz:], ((0, 0), (0, 0), (0, dz), (0, 0)))
        else:
            sh = cols
        y = jnp.einsum("pjzc,jco->pzo", sh, weights[:, dzi],
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out.astype(feats.dtype)


def pillar_down_conv(feats: jnp.ndarray, child: jnp.ndarray,
                     weights: jnp.ndarray) -> jnp.ndarray:
    """k2s2 down conv: (P, Z, C) fine -> (P', Z/2, Co) coarse.

    child: (P', 4) int32 — the fine pillar rows at xy offsets
    (0,0),(0,1),(1,0),(1,1) per coarse site (dy-minor lexicographic,
    matching kernel_offsets(2)), miss -> P. weights: (4, 2, C, Co),
    dz in {0, 1}. Z must be even.
    """
    p, z, c = feats.shape
    assert z % 2 == 0, z
    co = weights.shape[-1]
    fz = jnp.concatenate([feats, jnp.zeros((1, z, c), feats.dtype)], axis=0)
    cols = fz[child]  # (P', 4, Z, C)
    pairs = cols.reshape(child.shape[0], 4, z // 2, 2, c)
    out = jnp.einsum("pjzdc,jdco->pzo", pairs, weights,
                     preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def pillar_up_conv(feats: jnp.ndarray, parent: jnp.ndarray,
                   xy_parity: jnp.ndarray,
                   weights: jnp.ndarray) -> jnp.ndarray:
    """k2s2 transposed conv: (P', Z', C) coarse -> (P, 2*Z', Co) fine.

    Fine voxel v = (x, y, z) reads its parent (x>>1, y>>1, z>>1) through
    the weight of v's octant ((x&1)*4 + (y&1)*2 + (z&1)) — ME transpose
    semantics on the encoder's fine coordinate set. parent: (P,) int32
    coarse row per fine pillar (miss -> P'); xy_parity: (P,) int32 in
    [0, 4) = (x&1)*2 + (y&1); weights: (4, 2, C, Co) in the same layout
    as the down conv.

    All four xy-octant matmuls run over every pillar and the right one
    is selected per pillar — 4x the minimal FLOPs, the simple-correct
    v1 (grouping pillars by parity at topology build removes the waste;
    the down conv at the same level costs the same 8 einsums).
    """
    pp, zp, c = feats.shape
    co = weights.shape[-1]
    fz = jnp.concatenate([feats, jnp.zeros((1, zp, c), feats.dtype)], axis=0)
    par = fz[parent]  # (P, Z', C)
    # (P, Z', 4, 2, Co): per xy-octant j and z-parity d
    y = jnp.einsum("pzc,jdco->pzjdo", par, weights,
                   preferred_element_type=jnp.float32)
    sel = jnp.take_along_axis(
        y, xy_parity[:, None, None, None, None].astype(jnp.int32), axis=2
    )[:, :, 0]  # (P, Z', 2, Co)
    return sel.reshape(parent.shape[0], 2 * zp, co).astype(feats.dtype)
