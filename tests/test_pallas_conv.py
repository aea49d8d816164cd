"""Pallas fused brick conv vs the XLA brick conv (interpret mode on CPU;
compiled on TPU when available)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

import jax
import jax.numpy as jnp

from dropclip_tpu.sparse.bricks import BrickLevel, brick_conv
from dropclip_tpu.sparse.pallas_conv import TILE, pallas_brick_conv3


@pytest.mark.parametrize("shape", [(16, 128, 128), (8, 256, 128)])
def test_matches_xla_brick_conv(rng, shape):
    bm, c, cout = shape
    feats = jnp.asarray(rng.randn(bm, 4, 4, 4, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
    nbr_np = rng.randint(0, bm + 1, size=(bm, 27)).astype(np.int32)
    nbr_np[:, 13] = np.arange(bm)  # real topologies: center == self
    nbr = jnp.asarray(nbr_np)
    occ = jnp.asarray(rng.rand(bm, 4, 4, 4) > 0.5)
    w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32)
                    ).astype(jnp.bfloat16) * 0.05
    level = BrickLevel(coords=jnp.zeros((bm, 3), jnp.int32),
                       keys=jnp.zeros((bm,), jnp.int32),
                       mask=jnp.ones((bm,), bool), occ=occ, nbr=nbr)
    ref = np.asarray(brick_conv(feats, level, w, 3), np.float32)
    interpret = jax.default_backend() != "tpu"
    got = np.asarray(pallas_brick_conv3(feats, nbr, w, occ,
                                        interpret=interpret), np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 5e-3


def test_rejects_unaligned_channels(rng):
    bm = TILE
    feats = jnp.zeros((bm, 4, 4, 4, 64), jnp.bfloat16)
    nbr = jnp.zeros((bm, 27), jnp.int32)
    occ = jnp.ones((bm, 4, 4, 4), bool)
    w = jnp.zeros((27, 64, 64), jnp.bfloat16)
    with pytest.raises(AssertionError):
        pallas_brick_conv3(feats, nbr, w, occ, interpret=True)
