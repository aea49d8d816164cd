"""Pallas LayerNorm kernel parity (interpret mode on CPU) + fallback
dispatch contract."""

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_fused_add_ln_parity_interpret(rng):
    from dropclip_tpu.ops.layernorm import add_layer_norm, supports_fused

    assert supports_fused(1024) and supports_fused(768)
    # odd row count exercises the tail block; bf16 stream like the teacher
    x = jnp.asarray(rng.standard_normal((3, 131, 256)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    d = jnp.asarray(rng.standard_normal((3, 131, 256)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    s, y = add_layer_norm(x, d, scale, bias, interpret=True)
    # parity contract: s is the STREAM-dtype add; y is LN of that
    # requantized sum — bit-identical to the unfused model path
    s_want = x + d
    np.testing.assert_array_equal(
        np.asarray(s.astype(jnp.float32)),
        np.asarray(s_want.astype(jnp.float32)))
    from dropclip_tpu.ops.layernorm import layer_norm as ln

    # LN output: reduction order differs between the blocked kernel and
    # the jnp path, so match to bf16-ulp tolerance, not bit-exactly
    y_want = ln(s_want, scale, bias)
    np.testing.assert_allclose(np.asarray(y.astype(jnp.float32)),
                               np.asarray(y_want.astype(jnp.float32)),
                               rtol=0.02, atol=0.02)


@pytest.mark.slow  # opt-in DROPCLIP_FUSED_ADD_LN path (default OFF,
# measured slower on hardware) — parity guarded in the slow suite
def test_fused_stream_model_parity(rng, monkeypatch):
    # DROPCLIP_FUSED_ADD_LN on (jnp fallback on CPU) must reproduce the
    # plain block loop exactly — the fused stream is a restructuring, not
    # a different computation
    import jax

    from dropclip_tpu.teachers.clip import CLIPVisionTransformer

    vit = CLIPVisionTransformer(width=128, layers=3, heads=4, patch_size=8,
                                embed_dim=64, image_resolution=32,
                                dtype=jnp.bfloat16)
    px = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    v = vit.init(jax.random.PRNGKey(0), px)
    monkeypatch.delenv("DROPCLIP_FUSED_ADD_LN", raising=False)
    base_cls = vit.apply(v, px)
    base_patch = vit.apply(v, px, patch_output=True)
    monkeypatch.setenv("DROPCLIP_FUSED_ADD_LN", "1")
    fused_cls = vit.apply(v, px)
    fused_patch = vit.apply(v, px, patch_output=True)
    np.testing.assert_array_equal(np.asarray(base_cls, np.float32),
                                  np.asarray(fused_cls, np.float32))
    np.testing.assert_array_equal(np.asarray(base_patch, np.float32),
                                  np.asarray(fused_patch, np.float32))
