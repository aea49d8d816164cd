"""One-shot Pallas attention (ops/attention.py) vs XLA reference.

Runs in Pallas interpret mode on CPU (same pattern as test_pallas_conv).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dropclip_tpu.ops.attention import oneshot_attention, supports


@pytest.mark.parametrize("t", [13, 77, 128, 200])
def test_matches_dpa(rng, t):
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    want = jax.nn.dot_product_attention(q, k, v)
    got = oneshot_attention(q, k, v, interpret=True)
    assert got.shape == want.shape
    assert np.max(np.abs(np.asarray(got - want))) < 1e-5


def test_padded_keys_do_not_leak(rng):
    """Result must be invariant to what lies beyond t (the pad is
    synthesized inside, but key masking is what guarantees it)."""
    b, h, d, t = 1, 2, 16, 50
    q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
    got = oneshot_attention(q, k, v, interpret=True)
    # every output row is a convex combination of value rows
    assert float(jnp.max(got)) <= float(jnp.max(v)) + 1e-5
    assert float(jnp.min(got)) >= float(jnp.min(v)) - 1e-5


def test_supports():
    assert supports(769, 64, causal=False)   # the CLIP ViT hot shape
    assert not supports(769, 64, causal=True)
    assert not supports(8192, 64, causal=False)  # scores exceed VMEM
    # Mosaic-calibrated boundary (PERF.md): tq=1920 compiles on v5e,
    # tq=2048 does not — 518px DINOv2 grids (t=1370) and mid-length
    # DINO v1 strides take one-shot instead of tiled flash
    assert supports(1800, 64, causal=False)
    assert not supports(2048, 64, causal=False)


def test_bf16(rng):
    b, t, h, d = 2, 60, 2, 16
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    want = jax.nn.dot_product_attention(q, k, v)
    got = oneshot_attention(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    assert np.max(np.abs(np.asarray(got - want, np.float32))) < 2e-2


@pytest.mark.parametrize("t,heads,d", [(64, 4, 16), (100, 8, 16), (129, 4, 32)])
def test_packed_matches_dpa(rng, t, heads, d):
    """Packed-layout kernel == XLA attention on the reshaped views,
    including non-128-multiple T (partial tail block, in-kernel k/v
    masking)."""
    from dropclip_tpu.ops.attention import oneshot_attention_packed

    b, c = 2, heads * d
    q, k, v = (jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
               for _ in range(3))
    got = oneshot_attention_packed(q, k, v, heads, interpret=True)
    want = jax.nn.dot_product_attention(
        q.reshape(b, t, heads, d), k.reshape(b, t, heads, d),
        v.reshape(b, t, heads, d)).reshape(b, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_supports_packed():
    from dropclip_tpu.ops.attention import supports_packed

    assert supports_packed(769, 16, 64, causal=False)      # ViT-L hot shape
    assert not supports_packed(769, 16, 64, causal=True)
    assert not supports_packed(4096, 16, 64, causal=False)  # VMEM blow-up
    assert supports_packed(577, 12, 64, causal=False)       # ViT-B grid+cls
