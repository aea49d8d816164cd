import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.sparse.topology import (
    build_unet_topology,
    kernel_offsets,
)


def make_coords(rng, n_valid, cap, lo=-20, hi=20):
    pts = set()
    while len(pts) < n_valid:
        pts.add(tuple(rng.randint(lo, hi, 3)))
    coords = np.zeros((cap, 3), np.int32)
    coords[:n_valid] = np.array(sorted(pts), np.int32)
    mask = np.zeros(cap, bool)
    mask[:n_valid] = True
    return jnp.asarray(coords), jnp.asarray(mask)


def test_kernel_offsets():
    k3 = kernel_offsets(3)
    assert k3.shape == (27, 3)
    assert (k3.min(), k3.max()) == (-1, 1)
    k2 = kernel_offsets(2)
    assert k2.shape == (8, 3)
    assert (k2.min(), k2.max()) == (0, 1)
    k5 = kernel_offsets(5)
    assert k5.shape == (125, 3)


def test_k3_neighbor_map_bruteforce(rng):
    cap = 64
    coords, mask = make_coords(rng, 40, cap)
    topo = build_unet_topology(coords, mask, num_levels=2)
    lvl = topo.levels[0]
    cnp = np.asarray(lvl.coords)
    mnp = np.asarray(lvl.mask)
    index = {tuple(c): i for i, c in enumerate(cnp[mnp])}
    k3 = kernel_offsets(3)
    nbr = np.asarray(topo.k3_maps[0])
    for k, off in enumerate(k3):
        for i in range(cap):
            if not mnp[i]:
                assert nbr[k, i] == cap
                continue
            want = index.get(tuple(cnp[i] + off), cap)
            assert nbr[k, i] == want, (k, i, off)


def test_downsample_coords_are_floor_halved(rng):
    cap = 128
    coords, mask = make_coords(rng, 100, cap)
    # random coords barely dedup when halved -> give every level full
    # capacity (the halving default is for surface-like scenes)
    topo = build_unet_topology(coords, mask, num_levels=3,
                               capacities=(cap, cap, cap))
    fine = np.asarray(topo.levels[0].coords)[np.asarray(topo.levels[0].mask)]
    expect = {tuple(c) for c in (fine >> 1)}
    coarse = np.asarray(topo.levels[1].coords)[np.asarray(topo.levels[1].mask)]
    assert {tuple(c) for c in coarse} == expect
    # negative coords halve with floor: -3 >> 1 == -2
    assert (-3) >> 1 == -2


def test_down_map_children(rng):
    cap = 64
    coords, mask = make_coords(rng, 30, cap)
    topo = build_unet_topology(coords, mask, num_levels=2)
    fine, coarse = topo.levels
    fnp, fm = np.asarray(fine.coords), np.asarray(fine.mask)
    cnp, cm = np.asarray(coarse.coords), np.asarray(coarse.mask)
    fidx = {tuple(c): i for i, c in enumerate(fnp) if fm[i]}
    dmap = np.asarray(topo.down_maps[0])
    offs = kernel_offsets(2)
    for j in range(cap):
        if not cm[j]:
            assert np.all(dmap[:, j] == cap)
            continue
        for k, off in enumerate(offs):
            child = tuple(cnp[j] * 2 + off)
            assert dmap[k, j] == fidx.get(child, cap)


def test_up_maps_are_inverse_of_parenthood(rng):
    cap = 64
    coords, mask = make_coords(rng, 50, cap)
    topo = build_unet_topology(coords, mask, num_levels=2)
    fine, coarse = topo.levels
    fnp, fm = np.asarray(fine.coords), np.asarray(fine.mask)
    cnp, cm = np.asarray(coarse.coords), np.asarray(coarse.mask)
    up_p = np.asarray(topo.up_parent[0])
    up_o = np.asarray(topo.up_offset[0])
    for i in range(cap):
        if not fm[i]:
            continue
        parent = fnp[i] >> 1
        j = up_p[i]
        assert j < cap and cm[j]
        np.testing.assert_array_equal(cnp[j], parent)
        rel = fnp[i] & 1
        assert up_o[i] == rel[0] * 4 + rel[1] * 2 + rel[2]


def test_batched_topology_jit(rng):
    cap = 64
    cs, ms = zip(*[make_coords(rng, 30 + i, cap) for i in range(4)])
    coords = jnp.stack(cs)
    mask = jnp.stack(ms)
    topo = jax.jit(lambda c, m: build_unet_topology(c, m))(coords, mask)
    assert topo.levels[0].coords.shape == (4, cap, 3)
    assert topo.k3_maps[0].shape == (4, 27, cap)
    assert len(topo.levels) == 5


def test_unsorted_input_is_canonicalized(rng):
    cap = 32
    coords, mask = make_coords(rng, 20, cap)
    perm = np.asarray(rng.permutation(cap))
    t1 = build_unet_topology(coords, mask, num_levels=2)
    t2 = build_unet_topology(coords[perm], mask[perm], num_levels=2)
    np.testing.assert_array_equal(np.asarray(t1.levels[0].coords),
                                  np.asarray(t2.levels[0].coords))
    np.testing.assert_array_equal(np.asarray(t1.k3_maps[0]),
                                  np.asarray(t2.k3_maps[0]))
