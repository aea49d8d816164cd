"""Golden tests: flax DINOv2 vs HuggingFace Dinov2Model (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.teachers.dinov2 import (  # noqa: E402
    DinoV2ViT,
    Dinov2Extractor,
    from_hf_dinov2,
)

CFG = dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
           intermediate_size=128, image_size=28, patch_size=14,
           layer_norm_eps=1e-6)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    m = Dinov2Model(Dinov2Config(**CFG)).eval()
    # non-trivial LayerScale (HF initializes lambda to layerscale_value=1)
    with torch.no_grad():
        for layer in m.encoder.layer:
            layer.layer_scale1.lambda1.mul_(0.7)
            layer.layer_scale2.lambda1.mul_(1.3)
    return m


@pytest.fixture(scope="module")
def jax_model(hf_model):
    model = DinoV2ViT(width=64, layers=2, heads=4, patch_size=14,
                      image_resolution=28)
    params = from_hf_dinov2(hf_model.state_dict())
    return model, {"params": params}


def test_matches_hf(rng, hf_model, jax_model):
    model, variables = jax_model
    px = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = hf_model(pixel_values=torch.as_tensor(px)).last_hidden_state
    want_cls = out[:, 0].numpy()
    want_patch = out[:, 1:].numpy().reshape(2, 2, 2, 64)
    cls, patch = model.apply(variables, jnp.asarray(px.transpose(0, 2, 3, 1)))
    assert np.max(np.abs(np.asarray(cls) - want_cls)) < 1e-4
    assert np.max(np.abs(np.asarray(patch) - want_patch)) < 1e-4


def test_nonsquare_interpolates(rng, jax_model):
    model, variables = jax_model
    px = rng.randn(1, 28, 42, 3).astype(np.float32)
    cls, patch = model.apply(variables, jnp.asarray(px))
    assert patch.shape == (1, 2, 3, 64)
    assert bool(jnp.all(jnp.isfinite(patch))) and bool(
        jnp.all(jnp.isfinite(cls)))


def test_extractor_api(rng, jax_model):
    model, variables = jax_model
    ex = Dinov2Extractor(model, variables, mode="patch", img_resize=(28, 42),
                         batch_size=2)
    imgs = (rng.rand(3, 48, 64, 3) * 255).astype(np.uint8)
    pt = ex.get_patch_tokens(imgs)
    assert pt.shape == (3, 2, 3, 64)
    cls = ex.get_cls_token(imgs)
    assert cls.shape == (3, 64)
    ex.set_mode("cls")
    assert ex.extract(imgs).shape == (3, 64)
    with pytest.raises(ValueError):
        ex.set_mode("nope")


def test_swiglu_matches_hf(rng):
    """Giant-style SwiGLU FFN (use_swiglu_ffn) — HF-golden (reference
    dino/layers/swiglu_ffn.py SwiGLUFFNFused, used by vit_giant2)."""
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(1)
    m = Dinov2Model(Dinov2Config(use_swiglu_ffn=True, **CFG)).eval()
    with torch.no_grad():
        for layer in m.encoder.layer:
            layer.layer_scale1.lambda1.mul_(0.7)
            layer.layer_scale2.lambda1.mul_(1.3)
    model = DinoV2ViT(width=64, layers=2, heads=4, patch_size=14,
                      image_resolution=28, ffn="swiglu")
    variables = {"params": from_hf_dinov2(m.state_dict())}
    px = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = m(pixel_values=torch.as_tensor(px)).last_hidden_state
    cls, patch = model.apply(variables, jnp.asarray(px.transpose(0, 2, 3, 1)))
    assert np.max(np.abs(np.asarray(cls) - out[:, 0].numpy())) < 1e-4
    want_patch = out[:, 1:].numpy().reshape(2, 2, 2, 64)
    assert np.max(np.abs(np.asarray(patch) - want_patch)) < 1e-4


@pytest.mark.slow  # opt-in DROPCLIP_FUSED_ADD_LN path (default OFF,
# measured slower on hardware) — parity guarded in the slow suite
def test_fused_stream_parity(rng, monkeypatch):
    # DROPCLIP_FUSED_ADD_LN routes blocks through the fused residual
    # stream (Block(..., fused=True)); on CPU the jnp fallback must match
    # the default path to bf16 tolerance (nn.LayerNorm's fast-variance vs
    # the kernel's two-pass differ only in f32 rounding)
    import jax

    from dropclip_tpu.teachers.dinov2 import DinoV2ViT

    vit = DinoV2ViT(width=128, layers=2, heads=4, patch_size=14,
                    image_resolution=56, dtype=jnp.bfloat16)
    px = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 56, 56, 3)).astype(np.float32))
    monkeypatch.delenv("DROPCLIP_FUSED_ADD_LN", raising=False)
    v = vit.init(jax.random.PRNGKey(0), px)
    cls0, pat0 = vit.apply(v, px)
    monkeypatch.setenv("DROPCLIP_FUSED_ADD_LN", "1")
    cls1, pat1 = vit.apply(v, px)
    np.testing.assert_allclose(np.asarray(cls0, np.float32),
                               np.asarray(cls1, np.float32),
                               rtol=0.03, atol=0.03)
    np.testing.assert_allclose(np.asarray(pat0, np.float32),
                               np.asarray(pat1, np.float32),
                               rtol=0.03, atol=0.03)
