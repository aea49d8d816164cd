"""Pillar conv3: Pallas kernel + XLA formulation vs a dense-conv oracle.

The pillar layout is the TPU-native sparse-conv design (see
sparse/pallas_pillar.py): full-height z-columns, 9 xy-neighbor
full-block DMAs, z-taps as in-register row shifts. The oracle is
lax.conv_general_dilated on the equivalent dense grid with submanifold
masking — fully independent of both pillar implementations.

On CPU the Pallas kernel runs in interpret mode (tests/conftest.py pins
the backend); the hardware A/B lives in scripts/ab_pillar_conv.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dropclip_tpu.sparse.pallas_pillar import (PILLAR_DIRS,
                                               dense_pillar_scene,
                                               pallas_pillar_conv3,
                                               pillar_conv3_xla,
                                               pillar_tile)


def _problem(rng, gx, gy, z, c, cout, occupancy=0.5):
    feats_np, nbr_np, occ_np = dense_pillar_scene(rng, gx, gy, z, c,
                                                  occupancy)
    w_np = rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.05
    scale_np = rng.rand(cout).astype(np.float32) + 0.5
    bias_np = rng.randn(cout).astype(np.float32) * 0.1
    w9 = np.zeros((9, 3, c, cout), np.float32)
    for j, (dx, dy) in enumerate(PILLAR_DIRS):
        w9[j] = w_np[dx + 1, dy + 1]
    return feats_np, nbr_np, occ_np, w_np, w9, scale_np, bias_np


def _dense_oracle(feats_np, occ_np, w_np, scale_np, bias_np, relu,
                  gx, gy, z):
    c = feats_np.shape[-1]
    x = jnp.asarray(feats_np.reshape(1, gx, gy, z, c))
    k = jnp.asarray(w_np)
    dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                    ("NHWDC", "HWDIO", "NHWDC"))
    ref = lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                   dimension_numbers=dn)
    ref = ref * scale_np + bias_np
    if relu:
        ref = jax.nn.relu(ref)
    ref = ref * occ_np.reshape(1, gx, gy, z, 1)
    return np.asarray(ref, np.float32).reshape(gx * gy, z, -1)


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("z", [8, 16])
def test_pillar_conv_matches_dense_oracle(rng, relu, z):
    gx, gy, c, cout = 4, 4, 128, 128
    feats_np, nbr_np, occ_np, w_np, w9, scale_np, bias_np = _problem(
        rng, gx, gy, z, c, cout)
    ref = _dense_oracle(feats_np, occ_np, w_np, scale_np, bias_np, relu,
                        gx, gy, z)

    feats = jnp.asarray(feats_np).astype(jnp.bfloat16)
    nbr = jnp.asarray(nbr_np)
    occ = jnp.asarray(occ_np)
    w9j = jnp.asarray(w9).astype(jnp.bfloat16)
    scale, bias = jnp.asarray(scale_np), jnp.asarray(bias_np)
    den = max(np.abs(ref).max(), 1.0)

    got_x = np.asarray(pillar_conv3_xla(feats, nbr, w9j, occ, scale, bias,
                                        relu=relu), np.float32)
    assert np.abs(got_x - ref).max() / den < 5e-3

    interpret = jax.default_backend() != "tpu"
    got_p = np.asarray(pallas_pillar_conv3(feats, nbr, w9j, occ, scale, bias,
                                           relu=relu, interpret=interpret),
                       np.float32)
    assert np.abs(got_p - ref).max() / den < 5e-3


def test_pillar_conv_empty_neighbors(rng):
    """A pillar whose neighbors are all misses reduces to a 1x1xz conv
    column — miss rows must read silence, not garbage."""
    z, c, cout = 8, 128, 128
    p = pillar_tile(z)
    feats_np = rng.randn(p, z, c).astype(np.float32)
    occ_np = np.ones((p, z), bool)
    nbr_np = np.full((p, 9), p, np.int32)
    nbr_np[:, 4] = np.arange(p)  # self only
    w9 = rng.randn(9, 3, c, cout).astype(np.float32) * 0.05
    scale_np = np.ones(cout, np.float32)
    bias_np = np.zeros(cout, np.float32)

    # column-only reference: center dir taps with z shifts
    f = jnp.asarray(feats_np).astype(jnp.bfloat16)
    up = jnp.pad(f[:, :-1], ((0, 0), (1, 0), (0, 0)))
    dn = jnp.pad(f[:, 1:], ((0, 0), (0, 1), (0, 0)))
    ref = (jnp.einsum("pzc,co->pzo", up, w9[4, 0]) +
           jnp.einsum("pzc,co->pzo", f, w9[4, 1]) +
           jnp.einsum("pzc,co->pzo", dn, w9[4, 2]))
    ref = np.asarray(jax.nn.relu(ref), np.float32)

    interpret = jax.default_backend() != "tpu"
    got = np.asarray(pallas_pillar_conv3(
        f, jnp.asarray(nbr_np), jnp.asarray(w9).astype(jnp.bfloat16),
        jnp.asarray(occ_np), jnp.asarray(scale_np), jnp.asarray(bias_np),
        relu=True, interpret=interpret), np.float32)
    den = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / den < 5e-3


def test_pillar_conv_chunked_matches_single(rng, monkeypatch):
    """P > PILLAR_CHUNK splits the output into per-chunk pallas_calls
    (the scalar-prefetch table must fit Mosaic's 1 MB SMEM). Shrink the
    chunk so a small scene exercises the split, and check bit-equality
    with the unchunked path (same kernel, same inputs)."""
    import dropclip_tpu.sparse.pallas_pillar as pp

    z, c, cout = 8, 128, 128
    gx, gy = 6, 8  # P = 48 pillars
    feats_np, nbr_np, occ_np = dense_pillar_scene(rng, gx, gy, z, c, 0.5)
    w9 = rng.randn(9, 3, c, cout).astype(np.float32) * 0.05
    scale = jnp.ones(cout, jnp.float32)
    bias = jnp.zeros(cout, jnp.float32)
    f = jnp.asarray(feats_np).astype(jnp.bfloat16)
    nbr, occ = jnp.asarray(nbr_np), jnp.asarray(occ_np)
    w = jnp.asarray(w9).astype(jnp.bfloat16)
    interpret = jax.default_backend() != "tpu"

    whole = np.asarray(pp.pallas_pillar_conv3(
        f, nbr, w, occ, scale, bias, relu=True, interpret=interpret),
        np.float32)
    monkeypatch.setattr(pp, "PILLAR_CHUNK", 16)  # 3 chunks of 16 pillars
    # fresh jit cache entry: the chunk split happens at trace time
    chunked = np.asarray(pp.pallas_pillar_conv3.__wrapped__(
        f, nbr, w, occ, scale, bias, relu=True, interpret=interpret),
        np.float32)
    assert np.array_equal(whole, chunked)


def test_pillar_conv_chunked_misaligned_tile(rng, monkeypatch):
    """Regression: z=24 gives pillar_tile=5, which does NOT divide the
    chunk cap — slicing at raw PILLAR_CHUNK boundaries truncated
    n_tiles = pc // pt and silently dropped the tail pillars of every
    chunk. The step must round down to a pt multiple instead."""
    import dropclip_tpu.sparse.pallas_pillar as pp

    z, c, cout = 24, 128, 128
    assert pillar_tile(z) == 5  # the misaligned regime under test
    gx, gy = 4, 5  # P = 20 pillars (a pt multiple, as the API requires)
    feats_np, nbr_np, occ_np = dense_pillar_scene(rng, gx, gy, z, c, 0.5)
    w9 = rng.randn(9, 3, c, cout).astype(np.float32) * 0.05
    scale = jnp.ones(cout, jnp.float32)
    bias = jnp.zeros(cout, jnp.float32)
    f = jnp.asarray(feats_np).astype(jnp.bfloat16)
    nbr, occ = jnp.asarray(nbr_np), jnp.asarray(occ_np)
    w = jnp.asarray(w9).astype(jnp.bfloat16)
    interpret = jax.default_backend() != "tpu"

    whole = np.asarray(pp.pallas_pillar_conv3(
        f, nbr, w, occ, scale, bias, relu=True, interpret=interpret),
        np.float32)
    # chunk cap 16 -> step rounds down to 15 (3 tiles of 5); the old
    # slicing produced chunks of (16, 4) and never wrote pillars 15-19
    monkeypatch.setattr(pp, "PILLAR_CHUNK", 16)
    chunked = np.asarray(pp.pallas_pillar_conv3.__wrapped__(
        f, nbr, w, occ, scale, bias, relu=True, interpret=interpret),
        np.float32)
    assert np.array_equal(whole, chunked)
    assert np.isfinite(chunked).all()
