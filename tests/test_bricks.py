"""Brick-dense engine parity vs the gather engine (ops.sparse_conv*) on
identical voxel sets — the numerical contract that lets the two backends
interchange (both match ME semantics, tested in test_sparse_ops)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dropclip_tpu.sparse.bricks import (
    BS,
    brick_conv,
    brick_down_conv,
    brick_up_conv,
    build_brick_topology,
    gather_points,
    halo_exchange,
    scatter_points,
)
from dropclip_tpu.sparse.ops import sparse_conv, sparse_conv_transpose
from dropclip_tpu.sparse.topology import build_unet_topology

from test_sparse_topology import make_coords


@pytest.fixture
def fixture(rng):
    cap = 256
    coords, mask = make_coords(rng, 150, cap)
    vox_topo = build_unet_topology(coords, mask, num_levels=2,
                                   capacities=(cap, cap))
    brick_topo = build_brick_topology(coords, mask, num_levels=2,
                                      brick_capacities=(256, 128))
    feats = rng.randn(cap, 8).astype(np.float32) * np.asarray(mask)[:, None]
    return coords, mask, vox_topo, brick_topo, jnp.asarray(feats)


def test_scatter_gather_roundtrip(fixture):
    coords, mask, _, bt, feats = fixture
    dense = scatter_points(feats, bt.point_row, bt.point_within, 256)
    back = gather_points(dense, bt.point_row, bt.point_within)
    assert np.allclose(np.asarray(back), np.asarray(feats))
    # occupancy matches the scattered voxels
    occ_count = int(np.asarray(bt.levels[0].occ).sum())
    assert occ_count == int(np.asarray(mask).sum())


def test_halo_contains_neighbors(fixture):
    _, _, _, bt, feats = fixture
    lvl = bt.levels[0]
    dense = scatter_points(feats, bt.point_row, bt.point_within, 256)
    halo = halo_exchange(dense, lvl.nbr, pad=1)
    # center block is the brick itself
    assert np.allclose(np.asarray(halo[:, 1:5, 1:5, 1:5]), np.asarray(dense))


@pytest.mark.parametrize("ksize", [3, 5])
@pytest.mark.slow
def test_brick_conv_matches_gather_engine(fixture, rng, ksize):
    coords, mask, vt, bt, feats = fixture
    cin, cout = 8, 16
    w = rng.randn(ksize ** 3, cin, cout).astype(np.float32)
    ref = sparse_conv(feats, vt.stem_map if ksize == 5 else vt.k3_maps[0],
                      jnp.asarray(w), vt.levels[0].mask)

    dense = scatter_points(feats, bt.point_row, bt.point_within, 256)
    out = brick_conv(dense, bt.levels[0], jnp.asarray(w), ksize=ksize)
    got = gather_points(out, bt.point_row, bt.point_within)

    # align: vox topo reorders voxels by key; map through coords
    ref_np = np.asarray(ref)
    got_np = np.asarray(got)
    # compare per original voxel: vox topo voxel i corresponds to sorted
    # order; gather engine input feats were given in 'coords' order but
    # build_unet_topology re-sorts. Rebuild the permutation via keys.
    from dropclip_tpu.geom.voxelize import ravel_grid_coords

    keys_in = np.asarray(ravel_grid_coords(coords, valid=mask))
    order = np.argsort(keys_in, kind="stable")
    ref_aligned = np.zeros_like(ref_np)
    ref_aligned[order] = ref_np  # undo topology sort
    m = np.asarray(mask)
    assert np.max(np.abs(got_np[m] - ref_aligned[m])) < 1e-3


@pytest.mark.slow
def test_brick_down_up_match_gather_engine(fixture, rng):
    coords, mask, vt, bt, feats = fixture
    cin, cout = 8, 12
    wd = rng.randn(8, cin, cout).astype(np.float32)
    wu = rng.randn(8, cout, cin).astype(np.float32)

    # reference: gather engine on the voxel topology
    ref_down = sparse_conv(feats, vt.down_maps[0], jnp.asarray(wd),
                           vt.levels[1].mask)
    ref_up = sparse_conv_transpose(ref_down, vt.up_parent[0], vt.up_offset[0],
                                   jnp.asarray(wu), vt.levels[0].mask)

    dense = scatter_points(feats, bt.point_row, bt.point_within, 256)
    down = brick_down_conv(dense, bt.group_maps[0], bt.levels[1],
                           jnp.asarray(wd))
    up = brick_up_conv(down, bt.parent_maps[0], bt.octants[0], bt.levels[0],
                       jnp.asarray(wu))
    got_up = gather_points(up, bt.point_row, bt.point_within)

    from dropclip_tpu.geom.voxelize import ravel_grid_coords

    keys_in = np.asarray(ravel_grid_coords(coords, valid=mask))
    order = np.argsort(keys_in, kind="stable")
    ref_up_aligned = np.zeros_like(np.asarray(ref_up))
    ref_up_aligned[order] = np.asarray(ref_up)
    m = np.asarray(mask)
    assert np.max(np.abs(np.asarray(got_up)[m] - ref_up_aligned[m])) < 1e-3

    # coarse-level values match too: compare via coarse coords
    cl = bt.levels[1]
    vt_coarse = vt.levels[1]
    vt_cnp = np.asarray(vt_coarse.coords)[np.asarray(vt_coarse.mask)]
    ref_dn = np.asarray(ref_down)[np.asarray(vt_coarse.mask)]
    lut = {tuple(c): ref_dn[i] for i, c in enumerate(vt_cnp)}
    occ = np.asarray(cl.occ)
    cc = np.asarray(cl.coords)
    dn = np.asarray(down)
    checked = 0
    for b in range(cc.shape[0]):
        if not np.asarray(cl.mask)[b]:
            continue
        for x in range(BS):
            for y in range(BS):
                for z in range(BS):
                    if not occ[b, x, y, z]:
                        continue
                    vox = tuple(cc[b] * BS + np.array([x, y, z]))
                    assert vox in lut
                    assert np.max(np.abs(dn[b, x, y, z] - lut[vox])) < 1e-3
                    checked += 1
    assert checked > 20


def test_batched_topology(rng):
    cap = 128
    cs, ms = zip(*[make_coords(rng, 60, cap) for _ in range(2)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    bt = build_brick_topology(coords, mask, num_levels=3)
    assert bt.levels[0].occ.shape[0] == 2
    assert bt.point_row.shape == (2, cap)


def test_autotune_brick_capacities(rng):
    from dropclip_tpu.sparse.bricks import autotune_brick_capacities

    cap = 256
    cs, ms = zip(*[make_coords(rng, 200, cap) for _ in range(3)])
    coords, mask = np.stack(cs), np.stack(ms)
    caps = autotune_brick_capacities(coords, mask, num_levels=4,
                                     slack=1.2, multiple=64)
    assert len(caps) == 4
    # monotone non-increasing occupancy up the pyramid, floor respected
    assert all(c >= 32 and c % 64 == 0 or c == 32 for c in caps)
    # capacity covers the true occupied brick count of every batch entry
    for b in range(3):
        occ = np.unique(coords[b][mask[b]] >> 2, axis=0)
        assert caps[0] >= len(occ)
    # topology built with autotuned caps keeps every valid point
    bt = build_brick_topology(jnp.asarray(coords), jnp.asarray(mask),
                              num_levels=4, brick_capacities=caps)
    kept = np.asarray(bt.point_row) < caps[0]
    assert np.all(kept[np.asarray(mask)])


@pytest.mark.parametrize("bshape", [(4, 4, 2), (2, 2, 2)])
def test_anisotropic_scatter_gather_and_halo(rng, bshape):
    """Feature ops at non-default brick shapes: exact roundtrip, halo
    center identity, occupancy count."""
    cap = 256
    coords, mask = make_coords(rng, 150, cap)
    bt = build_brick_topology(coords, mask, num_levels=2,
                              brick_capacities=(256, 128),
                              brick_shape=bshape)
    feats = jnp.asarray(rng.randn(cap, 8).astype(np.float32)
                        * np.asarray(mask)[:, None])
    assert bt.levels[0].occ.shape[1:] == bshape
    dense = scatter_points(feats, bt.point_row, bt.point_within, 256, bshape)
    back = gather_points(dense, bt.point_row, bt.point_within)
    assert np.allclose(np.asarray(back), np.asarray(feats))
    assert int(np.asarray(bt.levels[0].occ).sum()) == int(
        np.asarray(mask).sum())
    halo = halo_exchange(dense, bt.levels[0].nbr, pad=1)
    bx, by, bz = bshape
    assert np.allclose(
        np.asarray(halo[:, 1:1 + bx, 1:1 + by, 1:1 + bz]), np.asarray(dense))
    # voxel -> brick mapping is consistent with the brick coords
    rows = np.asarray(bt.point_row)
    bcoords = np.asarray(bt.levels[0].coords)
    m = np.asarray(mask) & (rows < 256)
    want = np.asarray(coords)[m] // np.array(bshape)
    assert np.array_equal(bcoords[rows[m]], want)


def test_capacity_overflow_drops_gracefully(rng):
    """Caps below the occupied-brick count (the autotune slack's failure
    mode) must not crash: overflowed voxels map to the dump row and read
    back zeros; surviving voxels round-trip exactly."""
    cap_m = 512
    coords, mask = make_coords(rng, 400, cap_m)
    bt = build_brick_topology(coords, mask, num_levels=2,
                              brick_capacities=(8, 8))  # far too small
    feats = jnp.asarray(rng.randn(cap_m, 4).astype(np.float32)
                        * np.asarray(mask)[:, None])
    dense = scatter_points(feats, bt.point_row, bt.point_within, 8)
    back = np.asarray(gather_points(dense, bt.point_row, bt.point_within))
    rows = np.asarray(bt.point_row)
    kept = np.asarray(mask) & (rows < 8)
    dropped = np.asarray(mask) & (rows >= 8)
    assert dropped.any() and kept.any()
    assert np.allclose(back[kept], np.asarray(feats)[kept])
    assert np.abs(back[dropped]).max() == 0.0


def test_dropped_counts_zero_when_fitting(rng):
    cap_m = 256
    coords, mask = make_coords(rng, 150, cap_m)
    bt = build_brick_topology(coords, mask, num_levels=3,
                              brick_capacities=(256, 128, 64))
    assert bt.dropped.shape == (3,)
    assert int(np.asarray(bt.dropped).sum()) == 0


def test_dropped_counts_capacity_overflow(rng):
    """dropped[0] == exactly the valid voxels that didn't survive (the
    silent-truncation guard VERDICT r1 item 6 asked to surface)."""
    cap_m = 512
    coords, mask = make_coords(rng, 400, cap_m)
    bt = build_brick_topology(coords, mask, num_levels=2,
                              brick_capacities=(8, 8))
    rows = np.asarray(bt.point_row)
    expect = int((np.asarray(mask) & (rows >= 8)).sum())
    assert expect > 0
    assert int(np.asarray(bt.dropped)[0]) == expect


def test_dropped_counts_out_of_extent():
    """A voxel outside the grid extent is counted, not silently lost."""
    coords = np.zeros((64, 3), np.int32)
    coords[0] = (0, 0, 200)   # far outside +-64 at grid_bits=5
    coords[1] = (3, 2, 1)
    mask = np.zeros((64,), bool)
    mask[:2] = True
    bt = build_brick_topology(jnp.asarray(coords), jnp.asarray(mask),
                              num_levels=2, brick_capacities=(32, 32))
    assert int(np.asarray(bt.dropped)[0]) == 1


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_anisotropic_grid_extent_uniform(axis):
    """(4, 4, 2) bricks must NOT shrink the representable z range: the
    grid is anisotropic so the voxel extent is the same on every axis
    (ADVICE r1 medium). A voxel at +-60 on ANY axis survives."""
    for sign in (+1, -1):
        coords = np.zeros((64, 3), np.int32)
        coords[0, axis] = sign * 60
        coords[1] = (1, 2, 0)
        mask = np.zeros((64,), bool)
        mask[:2] = True
        bt = build_brick_topology(jnp.asarray(coords), jnp.asarray(mask),
                                  num_levels=2, brick_capacities=(32, 32),
                                  brick_shape=(4, 4, 2))
        assert int(np.asarray(bt.dropped).sum()) == 0, (axis, sign)
        # and the voxel actually reads back
        feats = jnp.asarray(
            np.arange(64 * 2, dtype=np.float32).reshape(64, 2)
            * np.asarray(mask)[:, None])
        dense = scatter_points(feats, bt.point_row, bt.point_within, 32,
                               brick_shape=(4, 4, 2))
        back = np.asarray(gather_points(dense, bt.point_row,
                                        bt.point_within))
        assert np.allclose(back[:2], np.asarray(feats)[:2])
