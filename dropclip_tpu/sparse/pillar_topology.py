"""Pillar-engine topology: xy-site pyramids + neighbor/child tables.

Host-side (numpy) builder, v1: the pillar engine is an INFERENCE
backend for volumetric scenes (bin/shelf data, where the pillar layout
measured 1.22x end-to-end over bricks — PERF.md "Volumetric
inversion"); offline topology build matches how it deploys (topology
is a per-scene setup cost, reused across queries). The brick engine
(sparse/bricks.py) remains the production train/infer path and builds
its topology on device.

Coordinate semantics mirror topology.py / MinkowskiEngine exactly:
level l+1 voxels = ``unique(floor(c/2))`` of level l OCCUPIED voxels;
the transpose reuses the encoder's fine sites. Pillar z extents halve
per level (Z0 a multiple of 16, so four strides stay even), and z is
shifted to [0, Z0) by a per-build offset.

Reference substrate being replaced: the MinkowskiEngine coordinate
manager behind models/distil/minkunet.py:49-126.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class PillarLevel(NamedTuple):
    xy: jnp.ndarray       # (P, 2) int32 site coords (level units)
    occ: jnp.ndarray      # (P, Z_l) bool voxel occupancy
    nbr9: jnp.ndarray     # (P, 9) int32 xy neighbors (dx-major), miss -> P
    mask: jnp.ndarray     # (P,) bool site validity (padding rows False)


class PillarTopology(NamedTuple):
    levels: Tuple[PillarLevel, ...]
    nbr25: jnp.ndarray                    # (P0, 25) stem k5 xy table
    child: Tuple[jnp.ndarray, ...]        # (P_{l+1}, 4) fine rows, miss->P_l
    parent: Tuple[jnp.ndarray, ...]       # (P_l,) coarse row per fine pillar
    xy_parity: Tuple[jnp.ndarray, ...]    # (P_l,) (x&1)*2 + (y&1)
    point_pillar: jnp.ndarray             # (M,) level-0 pillar row per point
    point_z: jnp.ndarray                  # (M,) level-0 z slot per point
    z_offset: int                         # world z = z + z_offset
    dropped: jnp.ndarray                  # () int32 — capacity-truncated sites


def _site_tables(xy: np.ndarray, cap: int, ks: Sequence[int]):
    """Neighbor tables for one level: for each kernel half-extent in
    ``ks`` return the (cap, (2k+1)^2) table (dx-major lexicographic),
    miss -> cap. ``cap >= len(xy)``; padding rows stay all-miss."""
    lut = {tuple(q): i for i, q in enumerate(xy.tolist())}
    outs = []
    for r in ks:
        side = 2 * r + 1
        tab = np.full((cap, side * side), cap, np.int32)
        for i, (x, y) in enumerate(xy.tolist()):
            j = 0
            for dx in range(-r, r + 1):
                for dy in range(-r, r + 1):
                    hit = lut.get((x + dx, y + dy))
                    if hit is not None:
                        tab[i, j] = hit
                    j += 1
        outs.append(tab)
    return outs, lut


def build_pillar_topology(coords, mask, num_levels: int = 5,
                          z0: Optional[int] = None,
                          site_capacities: Optional[Sequence[int]] = None
                          ) -> PillarTopology:
    """Build the pillar pyramid for ONE scene.

    coords: (M, 3) int32 voxel coords (any origin); mask: (M,) bool.
    z0: level-0 pillar height (multiple of 16; default fits the data).
    site_capacities: per-level pillar-row padding (default exact fit).
    Capacity overflow drops the highest-keyed sites and reports the
    count in ``dropped`` (the brick engine's convention).
    """
    coords = np.asarray(coords)
    mask = np.asarray(mask)
    occ_c = coords[mask]
    assert len(occ_c) > 0, "empty scene"
    # The z shift MUST be a multiple of 2^(num_levels-1): the pyramid is
    # floor(c / 2^l) in ABSOLUTE coordinates (ME semantics, and what the
    # brick/gather engines compute), and an arbitrary shift misaligns
    # every halving lattice — measured as a ~6% feature divergence vs
    # bricks on scenes whose zmin was odd/negative.
    zmin = int(occ_c[:, 2].min())
    z_off = (1 << (num_levels - 1)) * (zmin >> (num_levels - 1))
    zext = int(occ_c[:, 2].max()) - z_off + 1
    if z0 is None:
        z0 = max(16, 16 * ((zext + 15) // 16))
    assert z0 % 16 == 0 and zext <= z0, (z0, zext)

    # level voxel sets (np structured as {(x, y): occupied-z set})
    vox = occ_c - np.array([[0, 0, z_off]])
    levels_np = []  # (xy actual, occ padded, padded cap)
    dropped = 0
    for lvl in range(num_levels):
        z_l = z0 >> lvl
        xy, inv = np.unique(vox[:, :2], axis=0, return_inverse=True)
        cap = len(xy)
        vox_l = vox
        if site_capacities is not None:
            cap = int(site_capacities[lvl])
            if len(xy) > cap:  # truncate: drop highest-keyed sites
                dropped += len(xy) - cap
                keep = np.zeros(len(xy), bool)
                keep[:cap] = True  # xy is key-sorted
                sel = keep[inv]
                xy, vox_l = xy[:cap], vox[sel]
                _, inv = np.unique(vox_l[:, :2], axis=0, return_inverse=True)
            # cap > len(xy) pads: occ/nbr rows beyond len(xy) stay
            # empty/all-miss, mask False — static shapes across scenes
        occ = np.zeros((cap, z_l), bool)
        occ[inv, vox_l[:, 2]] = True
        levels_np.append((xy, occ, cap))
        vox = np.unique(vox_l // 2, axis=0)  # floor-div: next level voxels

    levels, childs, parents, parities = [], [], [], []
    nbr25 = None
    luts = []
    for lvl, (xy, occ, cap) in enumerate(levels_np):
        ks = [1, 2] if lvl == 0 else [1]
        tabs, lut = _site_tables(xy, cap, ks)
        luts.append(lut)
        if lvl == 0:
            nbr25 = jnp.asarray(tabs[1])
        levels.append(PillarLevel(
            xy=jnp.asarray(np.pad(xy, ((0, cap - len(xy)), (0, 0)))
                           .astype(np.int32)),
            occ=jnp.asarray(occ),
            nbr9=jnp.asarray(tabs[0]),
            mask=jnp.asarray(np.arange(cap) < len(xy))))
    for lvl in range(num_levels - 1):
        xy_f, xy_c = levels_np[lvl][0], levels_np[lvl + 1][0]
        cap_f, cap_c = levels_np[lvl][2], levels_np[lvl + 1][2]
        child = np.full((cap_c, 4), cap_f, np.int32)
        for i, (x, y) in enumerate(xy_c.tolist()):
            for j, (dx, dy) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                hit = luts[lvl].get((2 * x + dx, 2 * y + dy))
                if hit is not None:
                    child[i, j] = hit
        parent = np.full((cap_f,), cap_c, np.int32)
        for i, (x, y) in enumerate(xy_f.tolist()):
            hit = luts[lvl + 1].get((x // 2, y // 2))
            if hit is not None:
                parent[i] = hit
        parity = np.zeros((cap_f,), np.int32)
        parity[: len(xy_f)] = ((xy_f[:, 0] & 1) * 2
                               + (xy_f[:, 1] & 1)).astype(np.int32)
        childs.append(jnp.asarray(child))
        parents.append(jnp.asarray(parent))
        parities.append(jnp.asarray(parity))

    # per-point extraction map at level 0 (masked-out points -> pad)
    cap0 = levels_np[0][2]
    rows = np.asarray(
        [luts[0].get((x, y), cap0)
         for x, y in (coords[:, :2]).tolist()], np.int32)
    z_sl = np.clip(coords[:, 2] - z_off, 0, z0 - 1)
    pp = np.where(mask, rows, cap0).astype(np.int32)
    pz = np.where(mask, z_sl, 0).astype(np.int32)

    return PillarTopology(
        levels=tuple(levels), nbr25=nbr25, child=tuple(childs),
        parent=tuple(parents), xy_parity=tuple(parities),
        point_pillar=jnp.asarray(pp), point_z=jnp.asarray(pz),
        z_offset=z_off, dropped=jnp.asarray(np.int32(dropped)))


def scatter_points_pillar(feats: jnp.ndarray, topo: PillarTopology
                          ) -> jnp.ndarray:
    """(M, C) point features -> (P0, Z0, C) pillar-dense, zeros elsewhere."""
    p0, z0 = topo.levels[0].occ.shape
    c = feats.shape[-1]
    flat = jnp.zeros(((p0 + 1) * z0, c), feats.dtype)
    idx = topo.point_pillar * z0 + topo.point_z
    flat = flat.at[idx].set(feats.astype(flat.dtype))
    return flat.reshape(p0 + 1, z0, c)[:p0]


def gather_points_pillar(dense: jnp.ndarray, topo: PillarTopology
                         ) -> jnp.ndarray:
    """(P0, Z0, C) pillar-dense -> (M, C) per input point (pad -> 0)."""
    p0, z0, c = dense.shape
    flat = jnp.concatenate(
        [dense.reshape(p0 * z0, c), jnp.zeros((z0, c), dense.dtype)], axis=0)
    return flat[topo.point_pillar * z0 + topo.point_z]
