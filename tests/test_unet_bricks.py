"""Brick-backend UNet: full-network parity with the gather-backend UNet
using the SAME parameters (checkpoint compatibility), eval and train-mode
BN behavior."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

import jax
import jax.numpy as jnp

from dropclip_tpu.sparse.bricks import build_brick_topology
from dropclip_tpu.sparse.topology import build_unet_topology
from dropclip_tpu.sparse.unet import MinkUNet
from dropclip_tpu.sparse.unet_bricks import MinkUNetBricks

from test_sparse_topology import make_coords

ARCH = dict(out_channels=12, block="basic", layers=(1,) * 8,
            planes=(4, 4, 8, 8, 8, 8, 4, 4), init_dim=4)


@pytest.fixture
def batch(rng):
    cap, b = 256, 2
    cs, ms = zip(*[make_coords(rng, 120, cap) for _ in range(b)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    feats = jnp.asarray(rng.randn(b, cap, 6).astype(np.float32)) \
        * mask[..., None]
    return coords, mask, feats


def topos(coords, mask, brick_shape=(4, 4, 4)):
    vt = build_unet_topology(coords, mask, num_levels=5,
                             capacities=(256,) * 5)
    bt = build_brick_topology(coords, mask, num_levels=5,
                              brick_capacities=(256, 128, 64, 32, 32),
                              brick_shape=brick_shape)
    return vt, bt


@pytest.mark.parametrize("brick_shape", [(4, 4, 4), (4, 4, 2), (2, 4, 4)])
def test_unet_parity_same_params(batch, brick_shape):
    coords, mask, feats = batch
    vt, bt = topos(coords, mask, brick_shape)
    gather_net = MinkUNet(**ARCH)
    brick_net = MinkUNetBricks(**ARCH)

    variables = jax.jit(
        lambda t, f: gather_net.init(jax.random.PRNGKey(0), t, f,
                                     train=False))(vt, feats)
    ref = gather_net.apply(variables, vt, feats, train=False)
    got = brick_net.apply(variables, bt, feats, train=False)

    # gather-backend output is in key-sorted voxel order; brick output is
    # in the ORIGINAL input voxel order. align via the key sort.
    from dropclip_tpu.geom.voxelize import ravel_grid_coords

    for b in range(coords.shape[0]):
        keys = np.asarray(ravel_grid_coords(coords[b], valid=mask[b]))
        order = np.argsort(keys, kind="stable")
        ref_aligned = np.zeros_like(np.asarray(ref[b]))
        ref_aligned[order] = np.asarray(ref[b])
        m = np.asarray(mask[b])
        diff = np.max(np.abs(np.asarray(got[b])[m] - ref_aligned[m]))
        assert diff < 2e-3, diff


def test_brick_unet_train_mode_updates_stats(batch):
    coords, mask, feats = batch
    _, bt = topos(coords, mask)
    net = MinkUNetBricks(**ARCH)
    variables = net.init(jax.random.PRNGKey(0), bt, feats, train=False)
    out, updates = net.apply(variables, bt, feats, train=True,
                             mutable=["batch_stats"])
    assert out.shape == (2, 256, 12)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_brick_unet_padding_invariant(rng):
    """Extra padded voxel rows must not change occupied outputs."""
    cap = 256
    coords1, mask1 = make_coords(rng, 100, cap)
    net = MinkUNetBricks(**ARCH)
    caps = (256, 128, 64, 32, 32)
    bt1 = build_brick_topology(coords1[None], mask1[None], num_levels=5,
                               brick_capacities=caps)
    feats = jnp.asarray(rng.randn(1, cap, 6).astype(np.float32)) \
        * mask1[None, :, None]
    variables = net.init(jax.random.PRNGKey(1), bt1, feats, train=False)
    out1 = net.apply(variables, bt1, feats, train=False)

    # garbage in padded featured rows
    feats2 = feats + (~mask1[None, :, None]) * 123.0
    out2 = net.apply(variables, bt1, feats2, train=False)
    m = np.asarray(mask1)
    # padded input rows scatter to the guard slot, so occupied outputs
    # must be identical
    assert np.allclose(np.asarray(out1[0])[m], np.asarray(out2[0])[m],
                       atol=1e-5)


@pytest.mark.parametrize("train", [False, True])
def test_fold_batch_parity(batch, train):
    """bricks.fold_topology: the folded (one brick axis) forward must
    match the vmapped-over-scenes forward — eval bit-identical, train
    within reduction-order float noise (BN stats are global either way).
    The folded path is the single-device production fast path; the
    vmapped path stays for sharded data meshes."""
    coords, mask, feats = batch
    _, bt = topos(coords, mask, (4, 4, 2))
    net_v = MinkUNetBricks(fold_batch=False, **ARCH)
    net_f = MinkUNetBricks(fold_batch=True, **ARCH)
    variables = jax.jit(
        lambda t, f: net_v.init(jax.random.PRNGKey(0), t, f,
                                train=False))(bt, feats)
    if train:
        out_v, mut_v = net_v.apply(variables, bt, feats, train=True,
                                   mutable=["batch_stats"])
        out_f, mut_f = net_f.apply(variables, bt, feats, train=True,
                                   mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(mut_v), jax.tree.leaves(mut_f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_v),
                                   atol=5e-4, rtol=1e-3)
    else:
        out_v = net_v.apply(variables, bt, feats, train=False)
        out_f = net_f.apply(variables, bt, feats, train=False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_v),
                                   atol=1e-5, rtol=1e-5)
