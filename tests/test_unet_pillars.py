"""Pillar-engine MinkUNet vs the production brick engine.

The pillar engine (sparse/unet_pillars.py) is the inference backend for
volumetric scenes (PERF.md "Volumetric inversion": measured 1.22x
end-to-end over bricks where z columns run deep). Checkpoint
compatibility is the contract: the SAME variables (names + canonical
(K^3, Cin, Cout) kernel shapes) must produce the same per-point
features on both engines.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dropclip_tpu.data.synthetic import make_volumetric_coords
from dropclip_tpu.sparse.bricks import build_brick_topology
from dropclip_tpu.sparse.pillar_topology import build_pillar_topology
from dropclip_tpu.sparse.unet_bricks import MinkUNetBricks
from dropclip_tpu.sparse.unet_pillars import MinkUNetPillars

ARCH = dict(out_channels=16, block="basic", layers=(1,) * 8,
            planes=(4, 4, 8, 8, 8, 8, 4, 4), init_dim=4)


def _scene(rng, m=512, n_occ=400, z_shift=0):
    coords, mask = make_volumetric_coords(rng, 1, m, n_occ=n_occ, ext=8,
                                          zext=16)
    # z_shift moves the scene off the z=0 origin: the pyramid must stay
    # aligned to ABSOLUTE floor(c/2^l) lattices (regression: an
    # arbitrary per-scene z normalization diverged ~6% vs bricks on
    # odd/negative zmin)
    coords = coords + np.array([0, 0, z_shift], np.int32) * mask[..., None]
    feats = (rng.randn(1, m, 6).astype(np.float32)
             * mask[..., None]).astype(np.float32)
    return jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(feats)


@pytest.mark.parametrize("train,z_shift", [(False, 0), (True, 0),
                                           (False, -7)])
def test_pillar_unet_matches_bricks(rng, train, z_shift):
    coords, mask, feats = _scene(rng, z_shift=z_shift)
    btopo = build_brick_topology(coords, mask, brick_shape=(4, 4, 2))
    net_b = MinkUNetBricks(**ARCH)
    variables = jax.jit(
        lambda t, f: net_b.init(jax.random.PRNGKey(0), t, f,
                                train=False))(btopo, feats)

    ptopo = build_pillar_topology(np.asarray(coords[0]),
                                  np.asarray(mask[0]))
    net_p = MinkUNetPillars(**ARCH)

    if train:
        out_b, mut_b = net_b.apply(variables, btopo, feats, train=True,
                                   mutable=["batch_stats"])
        out_p, mut_p = net_p.apply(variables, ptopo, feats[0], train=True,
                                   mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(mut_b), jax.tree.leaves(mut_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)
    else:
        out_b = net_b.apply(variables, btopo, feats, train=False)
        out_p = net_p.apply(variables, ptopo, feats[0], train=False)

    a = np.asarray(out_b[0], np.float32)
    b = np.asarray(out_p, np.float32)
    assert b.shape == a.shape
    den = max(np.abs(a).max(), 1.0)
    assert np.abs(a - b).max() / den < 5e-3, np.abs(a - b).max()
    # masked-out points must be exactly zero on both engines
    pad = ~np.asarray(mask[0])
    assert np.abs(b[pad]).max() == 0.0


def test_pillar_unet_padded_capacities_invariant(rng):
    """site_capacities pads levels to static shapes (multi-scene jit
    reuse); padded rows are all-miss/unoccupied and must not change any
    output value."""
    coords, mask, feats = _scene(rng, m=256, n_occ=200)
    net_p = MinkUNetPillars(**ARCH)
    topo_a = build_pillar_topology(np.asarray(coords[0]),
                                   np.asarray(mask[0]))
    caps = [lv.occ.shape[0] + 37 for lv in topo_a.levels]
    topo_b = build_pillar_topology(np.asarray(coords[0]),
                                   np.asarray(mask[0]),
                                   site_capacities=caps)
    variables = net_p.init(jax.random.PRNGKey(0), topo_a, feats[0],
                           train=False)
    out_a = np.asarray(net_p.apply(variables, topo_a, feats[0],
                                   train=False))
    out_b = np.asarray(net_p.apply(variables, topo_b, feats[0],
                                   train=False))
    np.testing.assert_allclose(out_a, out_b, atol=1e-5, rtol=1e-5)


def test_pillar_topology_levels(rng):
    """Level pyramid semantics: unique(floor(c/2)) voxel sets, z halving,
    parent/child tables consistent."""
    coords, mask, _ = _scene(rng)
    topo = build_pillar_topology(np.asarray(coords[0]), np.asarray(mask[0]))
    occ_c = np.asarray(coords[0])[np.asarray(mask[0])]
    zmin = occ_c[:, 2].min()
    vox = occ_c - [0, 0, zmin]
    for lvl, level in enumerate(topo.levels):
        xy = np.asarray(level.xy)
        occ = np.asarray(level.occ)
        want = np.unique(vox, axis=0)
        got = np.argwhere(occ)
        got_coords = np.concatenate([xy[got[:, 0]], got[:, 1:]], axis=1)
        got_sorted = got_coords[np.lexsort(got_coords.T[::-1])]
        want_sorted = want[np.lexsort(want.T[::-1])]
        assert np.array_equal(got_sorted, want_sorted), f"level {lvl}"
        vox = np.unique(vox // 2, axis=0)
    for lvl in range(4):
        xy_f = np.asarray(topo.levels[lvl].xy)
        xy_c = np.asarray(topo.levels[lvl + 1].xy)
        parent = np.asarray(topo.parent[lvl])
        assert (parent < len(xy_c)).all()
        np.testing.assert_array_equal(xy_f // 2, xy_c[parent])


def test_pillar_unet_bottleneck_matches_bricks(rng):
    """Bottleneck twin (tiny_bn): the PBottleneck block (1x1 -> k3 ->
    1x1 expansion-4) must match the brick engine from shared variables."""
    coords, mask, feats = _scene(rng, m=256, n_occ=200)
    arch = dict(out_channels=16, block="bottleneck", layers=(1,) * 8,
                planes=(4, 4, 8, 8, 8, 8, 4, 4), init_dim=4)
    btopo = build_brick_topology(coords, mask, brick_shape=(4, 4, 2))
    net_b = MinkUNetBricks(**arch)
    variables = jax.jit(
        lambda t, f: net_b.init(jax.random.PRNGKey(0), t, f,
                                train=False))(btopo, feats)
    ptopo = build_pillar_topology(np.asarray(coords[0]),
                                  np.asarray(mask[0]))
    out_b = np.asarray(net_b.apply(variables, btopo, feats,
                                   train=False)[0], np.float32)
    out_p = np.asarray(MinkUNetPillars(**arch).apply(
        variables, ptopo, feats[0], train=False), np.float32)
    den = max(np.abs(out_b).max(), 1.0)
    assert np.abs(out_b - out_p).max() / den < 5e-3


def test_pconv_pallas_branch_matches_xla(rng):
    """PConv(use_pallas=True) takes the fused Pallas kernel when the
    level qualifies (Z % 8 == 0, C/Cout % 128): same numbers as the XLA
    formulation (interpret mode on CPU)."""
    from dropclip_tpu.sparse.pallas_pillar import dense_pillar_scene
    from dropclip_tpu.sparse.pillar_topology import PillarLevel
    from dropclip_tpu.sparse.unet_pillars import PConv

    z, c = 8, 128
    feats_np, nbr_np, occ_np = dense_pillar_scene(rng, 4, 4, z, c, 0.5)
    level = PillarLevel(xy=jnp.zeros((16, 2), jnp.int32),
                        occ=jnp.asarray(occ_np),
                        nbr9=jnp.asarray(nbr_np),
                        mask=jnp.ones((16,), bool))
    x = jnp.asarray(feats_np).astype(jnp.bfloat16)
    v = PConv(features=c, use_pallas=False).init(jax.random.PRNGKey(0),
                                                 x, level)
    ref = np.asarray(PConv(features=c, use_pallas=False).apply(
        v, x, level), np.float32)
    got = np.asarray(PConv(features=c, use_pallas=True).apply(
        v, x, level), np.float32)
    den = max(np.abs(ref).max(), 1.0)
    assert np.abs(ref - got).max() / den < 5e-3
