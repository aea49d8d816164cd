import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.sparse.ops import sparse_conv, sparse_conv_transpose
from dropclip_tpu.sparse.topology import build_unet_topology, kernel_offsets

from test_sparse_topology import make_coords


def dense_from_sparse(coords, mask, feats, grid=48, lo=-24):
    """Scatter sparse voxels into a dense (G,G,G,C) grid."""
    g = np.zeros((grid, grid, grid, feats.shape[-1]), np.float32)
    c = np.asarray(coords)[np.asarray(mask)] - lo
    f = np.asarray(feats)[np.asarray(mask)]
    g[c[:, 0], c[:, 1], c[:, 2]] = f
    return g


def test_sparse_conv_matches_dense_k3(rng):
    cap, cin, cout = 64, 5, 7
    coords, mask = make_coords(rng, 40, cap)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    feats = feats * mask[:, None]
    topo = build_unet_topology(coords, mask, num_levels=2)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    out = sparse_conv(feats, topo.k3_maps[0], jnp.asarray(w),
                      topo.levels[0].mask)
    # make_coords returns key-sorted coords, so topology preserved the order
    # and feats rows still line up.
    np.testing.assert_array_equal(np.asarray(topo.levels[0].coords),
                                  np.asarray(coords))

    # dense reference: out[p] = sum_off in[p+off] @ W[off]
    g = dense_from_sparse(coords, mask, feats)
    offs = kernel_offsets(3)
    dense_out = np.zeros((*g.shape[:3], cout), np.float32)
    for k, off in enumerate(offs):
        shifted = np.roll(g, shift=tuple(-off), axis=(0, 1, 2))
        dense_out += shifted @ w[k]

    cnp = np.asarray(coords)[np.asarray(mask)] + 24
    want = dense_out[cnp[:, 0], cnp[:, 1], cnp[:, 2]]
    got = np.asarray(out)[np.asarray(mask)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sparse_conv_stride2_matches_bruteforce(rng):
    cap, cin, cout = 64, 4, 6
    coords, mask = make_coords(rng, 35, cap)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32)) * mask[:, None]
    topo = build_unet_topology(coords, mask, num_levels=2)
    w = rng.randn(8, cin, cout).astype(np.float32)

    out = sparse_conv(feats, topo.down_maps[0], jnp.asarray(w),
                      topo.levels[1].mask)

    fnp, fm = np.asarray(coords), np.asarray(mask)
    fidx = {tuple(c): i for i, c in enumerate(fnp) if fm[i]}
    cnp, cm = np.asarray(topo.levels[1].coords), np.asarray(topo.levels[1].mask)
    offs = kernel_offsets(2)
    fz = np.asarray(feats)
    for j in range(cap):
        if not cm[j]:
            np.testing.assert_allclose(np.asarray(out)[j], 0.0)
            continue
        want = np.zeros(cout, np.float32)
        for k, off in enumerate(offs):
            i = fidx.get(tuple(cnp[j] * 2 + off))
            if i is not None:
                want += fz[i] @ w[k]
        np.testing.assert_allclose(np.asarray(out)[j], want, rtol=1e-4, atol=1e-4)


def test_sparse_conv_transpose_matches_bruteforce(rng):
    cap, cin, cout = 64, 6, 5
    coords, mask = make_coords(rng, 40, cap)
    topo = build_unet_topology(coords, mask, num_levels=2)
    cm = np.asarray(topo.levels[1].mask)
    cfeats = jnp.asarray(rng.randn(cap, cin).astype(np.float32)) * cm[:, None]
    w = rng.randn(8, cin, cout).astype(np.float32)

    out = sparse_conv_transpose(cfeats, topo.up_parent[0], topo.up_offset[0],
                                jnp.asarray(w), topo.levels[0].mask)

    fnp, fm = np.asarray(topo.levels[0].coords), np.asarray(topo.levels[0].mask)
    cidx = {tuple(c): j for j, c in enumerate(np.asarray(topo.levels[1].coords))
            if cm[j]}
    for i in range(cap):
        if not fm[i]:
            np.testing.assert_allclose(np.asarray(out)[i], 0.0)
            continue
        parent = cidx[tuple(fnp[i] >> 1)]
        rel = fnp[i] & 1
        o = rel[0] * 4 + rel[1] * 2 + rel[2]
        want = np.asarray(cfeats)[parent] @ w[o]
        np.testing.assert_allclose(np.asarray(out)[i], want, rtol=1e-4, atol=1e-4)


def test_sparse_conv_batched_and_grad(rng):
    cap, cin, cout = 32, 4, 3
    cs, ms = zip(*[make_coords(rng, 20, cap) for _ in range(3)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    topo = build_unet_topology(coords, mask, num_levels=2)
    feats = jnp.asarray(rng.randn(3, cap, cin).astype(np.float32)) * mask[..., None]
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

    def loss(w):
        out = sparse_conv(feats, topo.k3_maps[0], w, topo.levels[0].mask)
        return jnp.sum(out**2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
