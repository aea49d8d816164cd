"""Pallas LayerNorm kernel parity (interpret mode on CPU) + fallback
dispatch contract."""

import jax.numpy as jnp
import numpy as np

from dropclip_tpu.ops.layernorm import layer_norm, supports


def _ref_ln(x, scale, bias, eps=1e-5):
    xf = np.asarray(x, np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) / np.sqrt(var + eps)
    return y * scale + bias


def test_kernel_parity_interpret(rng):
    # odd row count exercises the pad/unpad path; 3-d leading shape
    x = rng.standard_normal((3, 257, 256)).astype(np.float32) * 3 + 1
    scale = rng.standard_normal(256).astype(np.float32)
    bias = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), interpret=True))
    np.testing.assert_allclose(got, _ref_ln(x, scale, bias),
                               rtol=1e-5, atol=1e-5)


def test_kernel_parity_bf16(rng):
    x = jnp.asarray(rng.standard_normal((512, 1024)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    got = np.asarray(layer_norm(x, scale, bias, interpret=True)
                     .astype(jnp.float32))
    want = _ref_ln(np.asarray(x.astype(jnp.float32)), np.asarray(scale),
                   np.asarray(bias))
    # bf16 output: one ulp of the f32-computed reference
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)
    assert got.dtype == np.float32 and x.dtype == jnp.bfloat16


def test_fallback_matches_kernel(rng):
    # width 100 is lane-unfriendly -> jnp path; same math
    assert not supports(100)
    x = rng.standard_normal((64, 100)).astype(np.float32)
    scale = np.ones(100, np.float32)
    bias = np.zeros(100, np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias)))
    np.testing.assert_allclose(got, _ref_ln(x, scale, bias),
                               rtol=1e-5, atol=1e-5)
    assert supports(1024) and supports(768)
