"""Pallas TPU kernel: fused submanifold conv3 in PILLAR layout.

TPU-native answer to the reference's MinkowskiEngine 3x3x3 submanifold
convolution (reference models/minkunet.py:49-126): instead of hash-map
gather/scatter (voxel-level dynamic indexing the MXU cannot feed from),
voxels are grouped into full-height z-columns — "pillars" — of shape
(Z, C) at each occupied (x, y) site.

Why pillars and not halo bricks: Mosaic requires DMA slices along the
second-minor (sublane-tiled) dim to be multiples of the 8-row tile, so
the classic "assemble a (bx+2, by+2, bz+2) halo by 27 slab DMAs" design
is unimplementable for brick extents < 8 (measured: `Slice shape along
dimension 4 must be aligned to tiling (8), but is 2`). Pillars dissolve
the problem:

  * the 9 xy-neighbor copies are FULL-BLOCK (Z, C) DMAs — always legal,
    and only 9x feature bytes move per output pillar (the whole-brick
    v1 kernel moved 27x);
  * the 3 z-taps become in-register row shifts of an already-resident
    column — zero extra bytes, and the zero pad at the column ends IS
    the correct boundary semantics (outside the scene is empty), so no
    cross-block z logic exists at all;
  * every tap matmul is (TILE*Z, C) @ (C, Cout) — MXU-shaped rows with
    layout-free reshapes (Z is a multiple of the sublane tile).

The kernel double-buffers pillar DMAs across grid steps (tile i+1's 9*T
copies overlap tile i's 27 matmuls) and fuses the folded-BN scale/bias
+ ReLU + occupancy-mask epilogue that XLA otherwise runs as a separate
HBM pass after its conv.

Layouts: feats (P+1, Z, C) bf16 (row P = zeros: neighbor misses read
silence), nbr (P, 9) int32 xy-neighbor rows (miss -> P), weights
(9, 3, C, Cout) = (xy-dir, dz+1, C, Cout), occ (P, Z) bool.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# xy-direction order: dx-major, dy-minor, both ascending; index 4 is the
# pillar itself (matching nbr[:, 4] == row in a well-formed table).
PILLAR_DIRS = tuple((dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))


def pillar_tile(z: int) -> int:
    """Pillars per grid step: sized so every tap matmul has 128 rows
    (p_tile * Z) — a full MXU pass — and the double-buffered column
    scratch stays a constant 2 * 128 * 9 * C bytes regardless of Z."""
    return max(1, 128 // z)


# Max output pillars per pallas_call: the scalar-prefetch SMEM operand is
# 9 ints/pillar, and Mosaic caps SMEM allocations at 1 MB — 8192 pillars
# = 288 KB leaves headroom. Larger P is handled by slicing the OUTPUT
# into chunks; feats stay whole in HBM so the (global) neighbor indices
# in each chunk's table remain valid. NOT always divisible by
# pillar_tile(z) — z=24 -> pt=5, z=40 -> pt=3 pass the z%8 gate — so the
# chunk slicing below rounds the step DOWN to a pt multiple; slicing at
# a raw PILLAR_CHUNK boundary would truncate n_tiles = pc // pt and
# silently never write the last pc % pt pillars of each chunk.
PILLAR_CHUNK = 8192


def _z_shift(col: jnp.ndarray, dz: int) -> jnp.ndarray:
    """shifted[..., z, :] = col[..., z + dz, :], zero-padded at the ends
    (outside the scene is empty — exactly submanifold conv semantics)."""
    if dz == 0:
        return col
    if dz == -1:
        return jnp.pad(col[..., :-1, :], ((0, 0), (1, 0), (0, 0)))
    return jnp.pad(col[..., 1:, :], ((0, 0), (0, 1), (0, 0)))


def _pillar_kernel(nbr_ref, feats_hbm, w_ref, scale_ref, bias_ref,
                   occ_ref, out_ref, buf, sems, *, z, pt, n_tiles, relu):
    """Grid (n_tiles,): pt = pillar_tile(z) output pillars per step.

    nbr_ref: this chunk's neighbor table FLATTENED to (<= PILLAR_CHUNK*9,)
    as a scalar-prefetch SMEM operand — 1-D so Mosaic allocates it
    exactly (a (P, 9) operand gets its minor dim lane-padded 9 -> 128,
    measured: 4 MB for P=8192 vs the 1 MB SMEM ceiling; flat it is
    288 KB at the chunk cap, and larger scenes are split at the call
    site). The double buffer can address any tile's rows directly.
    buf: (2, pt, 9, Z, C) VMEM — slot i%2 holds tile i's neighbor
    columns. sems: (2, pt, 9) DMA semaphores.
    """
    c = w_ref.shape[2]
    cout = w_ref.shape[3]
    i = pl.program_id(0)

    def copies(slot, base):
        return [pltpu.make_async_copy(feats_hbm.at[nbr_ref[(base + t) * 9 + j]],
                                      buf.at[slot, t, j], sems.at[slot, t, j])
                for t in range(pt) for j in range(9)]

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    # prefetch tile i+1 into the other slot before blocking on this tile
    @pl.when(i + 1 < n_tiles)
    def _():
        for cp in copies(1 - slot, (i + 1) * pt):
            cp.start()

    for cp in copies(slot, i * pt):
        cp.wait()

    acc = jnp.zeros((pt * z, cout), jnp.float32)
    for j in range(9):
        col = buf[slot, :, j]  # (pt, Z, C)
        for dzi, dz in enumerate((-1, 0, 1)):
            rows = _z_shift(col, dz).reshape(pt * z, c)
            acc = acc + jnp.dot(rows, w_ref[j, dzi],
                                preferred_element_type=jnp.float32)

    y = acc * scale_ref[0][None, :] + bias_ref[0][None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y * occ_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype).reshape(pt, z, cout)


@partial(jax.jit, static_argnames=("relu", "interpret"))
def pallas_pillar_conv3(feats: jnp.ndarray, nbr: jnp.ndarray,
                        weights: jnp.ndarray, occ: jnp.ndarray,
                        scale: jnp.ndarray, bias: jnp.ndarray,
                        relu: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused k3 submanifold pillar conv + folded-BN epilogue.

    Computes ``mask(relu(conv3(feats) * scale + bias))`` — the
    inference-mode conv->BN->ReLU sequence of every UNet stage — in one
    kernel pass over HBM.

    feats: (P, Z, C); nbr: (P, 9) int32 xy-neighbors in PILLAR_DIRS
    order (miss -> P); weights: (9, 3, C, Cout); occ: (P, Z) bool;
    scale/bias: (Cout,). Z must be a multiple of 8 (sublane tile), C
    and Cout multiples of 128 (lane tile), P a multiple of
    pillar_tile(Z).
    """
    p, z, c = feats.shape
    cout = weights.shape[-1]
    pt = pillar_tile(z)
    assert z % 8 == 0, z
    assert c % 128 == 0 and cout % 128 == 0, (c, cout)
    assert p % pt == 0, (p, pt)
    assert weights.shape[:3] == (9, 3, c), weights.shape
    fz = jnp.concatenate([feats, jnp.zeros((1, z, c), feats.dtype)], axis=0)
    w = weights.astype(feats.dtype)
    sc = scale.astype(jnp.float32).reshape(1, cout)
    bi = bias.astype(jnp.float32).reshape(1, cout)
    occ_f = occ.astype(feats.dtype)

    def chunk_call(nbr_c, occ_c):
        pc = nbr_c.shape[0]
        # backstop: a misaligned chunk would truncate n_tiles and leave
        # the tail pillars of this chunk unwritten
        assert pc % pt == 0, (pc, pt)
        n_tiles = pc // pt
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # feats stay in HBM
                pl.BlockSpec((9, 3, c, cout), lambda i, nbr: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i, nbr: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda i, nbr: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pt * z, 1), lambda i, nbr: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((pt, z, cout), lambda i, nbr: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, pt, 9, z, c), feats.dtype),
                pltpu.SemaphoreType.DMA((2, pt, 9)),
            ],
        )
        return pl.pallas_call(
            partial(_pillar_kernel, z=z, pt=pt, n_tiles=n_tiles, relu=relu),
            out_shape=jax.ShapeDtypeStruct((pc, z, cout), feats.dtype),
            interpret=interpret,
            grid_spec=grid_spec,
        )(nbr_c.reshape(pc * 9), fz, w, sc, bi, occ_c.reshape(pc * z, 1))

    if p <= PILLAR_CHUNK:
        return chunk_call(nbr, occ_f)
    # Chunk the OUTPUT so each call's scalar-prefetch table fits SMEM;
    # neighbor indices are global (into the shared HBM fz), so slicing
    # nbr/occ/out is the only change. One pipeline drain per chunk
    # (~64+ tiles) is noise. Chunk boundaries MUST land on pt multiples
    # (pt=5/3 for z=24/40 do not divide 8192) — the final chunk is then
    # aligned too because p % pt == 0 was asserted above.
    step = (PILLAR_CHUNK // pt) * pt
    outs = [chunk_call(nbr[s:s + step], occ_f[s:s + step])
            for s in range(0, p, step)]
    return jnp.concatenate(outs, axis=0)


def pillar_conv3_xla(feats: jnp.ndarray, nbr: jnp.ndarray,
                     weights: jnp.ndarray, occ: jnp.ndarray,
                     scale: jnp.ndarray, bias: jnp.ndarray,
                     relu: bool = True) -> jnp.ndarray:
    """XLA reference for the pillar conv (same args/semantics) — the
    gather -> 3 shifted einsums -> epilogue formulation. Used as the
    parity oracle and as the XLA-side arm of the hardware A/B."""
    p, z, c = feats.shape
    fz = jnp.concatenate([feats, jnp.zeros((1, z, c), feats.dtype)], axis=0)
    cols = fz[nbr]  # (P, 9, Z, C)
    y = jnp.einsum("pjzc,jco->pzo",
                   jnp.pad(cols[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0))),
                   weights[:, 0], preferred_element_type=jnp.float32)
    y = y + jnp.einsum("pjzc,jco->pzo", cols, weights[:, 1],
                       preferred_element_type=jnp.float32)
    y = y + jnp.einsum("pjzc,jco->pzo",
                       jnp.pad(cols[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0))),
                       weights[:, 2], preferred_element_type=jnp.float32)
    y = y * scale + bias
    if relu:
        y = jax.nn.relu(y)
    return (y * occ[..., None]).astype(feats.dtype)


def dense_pillar_scene(rng, gx: int, gy: int, z: int, c: int,
                       occupancy: float = 0.5):
    """Build a dense-grid pillar scene for oracle testing: every (x, y)
    site is a pillar; nbr follows grid adjacency with out-of-range -> P.
    Returns (feats, nbr, occ) with features zeroed at unoccupied voxels
    (submanifold input semantics)."""
    p = gx * gy
    occ = rng.rand(gx, gy, z) < occupancy
    feats = rng.randn(gx, gy, z, c).astype(np.float32) * occ[..., None]
    nbr = np.full((gx, gy, 9), p, np.int32)
    for j, (dx, dy) in enumerate(PILLAR_DIRS):
        xs = np.arange(gx) + dx
        ys = np.arange(gy) + dy
        valid = (xs[:, None] >= 0) & (xs[:, None] < gx) & \
                (ys[None, :] >= 0) & (ys[None, :] < gy)
        idx = np.clip(xs[:, None], 0, gx - 1) * gy + \
            np.clip(ys[None, :], 0, gy - 1)
        nbr[:, :, j] = np.where(valid, idx, p)
    return (feats.reshape(p, z, c), nbr.reshape(p, 9),
            occ.reshape(p, z))
