"""Sparse-voxel topology: coordinate pyramids + kernel maps, built on device.

TPU-native replacement for MinkowskiEngine's dynamic coordinate manager +
kernel maps (the native substrate behind every ``ME.MinkowskiConvolution``
call in reference models/distil/minkunet.py:49-126). XLA needs static
shapes, so:

- every pyramid level is a fixed-capacity, mask-padded voxel set, kept in
  ascending packed-key order;
- neighbor lookup is binary search (``searchsorted``) into the sorted keys —
  O(log M) per query, fully vectorized, no host round-trips;
- kernel maps are dense ``(K, M)`` int32 index arrays where a miss points at
  row ``M`` (a zero-padding row appended by the conv ops).

Stride-2 downsampling halves coordinates with floor semantics (arithmetic
shift), matching ME's output coordinate set ``unique(floor(c/2))``; the
transposed convolution reuses the *encoder's* coordinate sets, which is
exactly how ME's coordinate-key reuse makes the UNet skip concats line up
(reference models/distil/minkunet.py:128-195).
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.voxelize import INVALID_KEY, ravel_grid_coords


def kernel_offsets(size: int, dim: int = 3) -> np.ndarray:
    """Integer offsets covered by a cubic kernel, in canonical (x,y,z
    lexicographic) order. Odd sizes are centered (ME convention for odd
    kernels); even sizes cover [0, size) (ME convention for the k2s2
    down-convs)."""
    if size % 2 == 1:
        r = range(-(size // 2), size // 2 + 1)
    else:
        r = range(0, size)
    return np.asarray(list(itertools.product(r, repeat=dim)), dtype=np.int32)


class SparseLevel(NamedTuple):
    coords: jnp.ndarray  # (M, 3) int32, level-normalized units, key-ascending
    keys: jnp.ndarray    # (M,) int32 packed keys, INVALID_KEY on padding
    mask: jnp.ndarray    # (M,) bool occupancy


class UNetTopology(NamedTuple):
    """All index structure one UNet forward needs, as one pytree.

    ``levels[l]`` holds the voxel set at stride ``2**l``. Maps are per
    transition/level; a miss/padding index equals that level's capacity.
    """

    levels: Tuple[SparseLevel, ...]
    stem_map: jnp.ndarray                  # (K5, M0) neighbor map, k=5 @ L0
    k3_maps: Tuple[jnp.ndarray, ...]       # (27, M_l) per level
    down_maps: Tuple[jnp.ndarray, ...]     # (8, M_{l+1}) children in level l
    up_parent: Tuple[jnp.ndarray, ...]     # (M_l,) parent row in level l+1
    up_offset: Tuple[jnp.ndarray, ...]     # (M_l,) child offset id in [0, 8)


def _neighbor_map(level: SparseLevel, offsets: np.ndarray, bits: int) -> jnp.ndarray:
    """(K, M) indices of coords+offset within the level; capacity M on miss."""
    m = level.keys.shape[0]
    nbr = level.coords[None, :, :] + jnp.asarray(offsets)[:, None, :]
    nbr_keys = ravel_grid_coords(nbr, bits=bits,
                                 valid=jnp.broadcast_to(level.mask, nbr.shape[:2]))
    idx = jnp.searchsorted(level.keys, nbr_keys, method="sort").astype(jnp.int32)
    idx_c = jnp.clip(idx, 0, m - 1)
    found = (nbr_keys != INVALID_KEY) & (jnp.take(level.keys, idx_c) == nbr_keys)
    return jnp.where(found, idx_c, m)


def _unique_sorted_keys(keys: jnp.ndarray, capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deduplicate already-sorted keys into a fixed-capacity sorted set."""
    prev = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
    heads = (keys != prev) & (keys != INVALID_KEY)
    ids = jnp.cumsum(heads.astype(jnp.int32)) - 1
    scatter = jnp.where(heads & (ids < capacity), ids, capacity)
    out = jnp.full((capacity,), INVALID_KEY, keys.dtype).at[scatter].set(
        keys, mode="drop")
    n = jnp.minimum(jnp.sum(heads.astype(jnp.int32)), capacity)
    mask = jnp.arange(capacity) < n
    return jnp.where(mask, out, INVALID_KEY), mask


def _downsample_level(level: SparseLevel, capacity: int, bits: int
                      ) -> Tuple[SparseLevel, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build level l+1 from level l.

    Returns (coarse_level, down_map (8, Mc), up_parent (Mf,), up_offset (Mf,)).
    """
    mf = level.keys.shape[0]
    parent_coords = level.coords >> 1  # floor halving (arithmetic shift)
    parent_keys = ravel_grid_coords(parent_coords, bits=bits, valid=level.mask)
    # Halving does NOT preserve lexicographic key order (x-ties broken by y
    # can invert once distinct x values merge), so sort before dedup.
    coarse_keys, coarse_mask = _unique_sorted_keys(jnp.sort(parent_keys), capacity)
    from ..geom.voxelize import unravel_key

    coarse_coords = jnp.where(coarse_mask[:, None],
                              unravel_key(coarse_keys, bits=bits), 0)
    coarse = SparseLevel(coords=coarse_coords, keys=coarse_keys, mask=coarse_mask)

    # k2s2 conv map: children of coarse voxel C live at 2C + {0,1}^3 in level l.
    child = (coarse_coords[None, :, :] * 2
             + jnp.asarray(kernel_offsets(2))[:, None, :])
    child_keys = ravel_grid_coords(child, bits=bits,
                                   valid=jnp.broadcast_to(coarse_mask, child.shape[:2]))
    idx = jnp.searchsorted(level.keys, child_keys, method="sort").astype(jnp.int32)
    idx_c = jnp.clip(idx, 0, mf - 1)
    found = (child_keys != INVALID_KEY) & (jnp.take(level.keys, idx_c) == child_keys)
    down_map = jnp.where(found, idx_c, mf)

    # transposed-conv map: each fine voxel's parent row + offset id.
    mc = capacity
    pidx = jnp.searchsorted(coarse_keys, parent_keys, method="sort").astype(jnp.int32)
    pidx_c = jnp.clip(pidx, 0, mc - 1)
    pfound = (parent_keys != INVALID_KEY) & (jnp.take(coarse_keys, pidx_c) == parent_keys)
    up_parent = jnp.where(pfound, pidx_c, mc)
    rel = level.coords & 1
    up_offset = (rel[:, 0] * 4 + rel[:, 1] * 2 + rel[:, 2]).astype(jnp.int32)
    up_offset = jnp.where(level.mask, up_offset, 0)
    return coarse, down_map, up_parent, up_offset


@partial(jax.jit, static_argnames=("num_levels", "stem_kernel", "bits", "capacities"))
def _build_single(coords: jnp.ndarray, mask: jnp.ndarray, num_levels: int,
                  stem_kernel: int, bits: int,
                  capacities: Tuple[int, ...]) -> UNetTopology:
    keys = ravel_grid_coords(coords, bits=bits, valid=mask)
    # Enforce the sorted invariant (inputs from geom.sparse_quantize already
    # satisfy it; sorting again is cheap and makes the API forgiving).
    order = jnp.argsort(keys, stable=True)
    keys = keys[order]
    coords = coords[order]
    mask = keys != INVALID_KEY
    coords = jnp.where(mask[:, None], coords, 0)

    level = SparseLevel(coords=coords, keys=keys, mask=mask)
    levels = [level]
    down_maps, up_parents, up_offsets = [], [], []
    for l in range(num_levels - 1):
        coarse, dmap, up_p, up_o = _downsample_level(level, capacities[l + 1], bits)
        levels.append(coarse)
        down_maps.append(dmap)
        up_parents.append(up_p)
        up_offsets.append(up_o)
        level = coarse

    k3 = kernel_offsets(3)
    k3_maps = tuple(_neighbor_map(lv, k3, bits) for lv in levels)
    stem_map = _neighbor_map(levels[0], kernel_offsets(stem_kernel), bits)
    return UNetTopology(levels=tuple(levels), stem_map=stem_map,
                        k3_maps=k3_maps, down_maps=tuple(down_maps),
                        up_parent=tuple(up_parents), up_offset=tuple(up_offsets))


def build_unet_topology(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    num_levels: int = 5,
    stem_kernel: int = 5,
    bits: int = 10,
    capacities: Sequence[int] | None = None,
) -> UNetTopology:
    """Build the full coordinate pyramid + kernel maps for a UNet forward.

    Args:
      coords: (B, M, 3) or (M, 3) int32 voxel coords at stride 1.
      mask: matching (B, M) or (M,) occupancy.
      capacities: per-level max voxel counts. Default halves per level
        (min 64): surface-like scenes lose >=2x voxels per stride-2
        halving, and compute at level l scales with its capacity, so
        full-size buffers at coarse levels would waste most of the UNet's
        FLOPs/gather traffic. Capacity overflow drops the highest-key
        voxels (masked, not UB) — pass explicit capacities if a scene is
        denser than surface-like.
    """
    batched = coords.ndim == 3
    m = coords.shape[-2]
    if capacities is not None:
        caps = tuple(capacities)
    else:
        caps = tuple(max(m >> l, min(m, 64)) for l in range(num_levels))
    assert len(caps) == num_levels
    assert caps[0] == m, "level-0 capacity must equal the input point dim"
    fn = lambda c, k: _build_single(c, k, num_levels=num_levels,
                                    stem_kernel=stem_kernel, bits=bits,
                                    capacities=caps)
    if batched:
        return jax.vmap(fn)(coords, mask)
    return fn(coords, mask)
