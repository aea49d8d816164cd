"""Golden tests of ops/resize vs torch F.interpolate (the reference's
interpolation substrate: clip/interpolate.py bicubic pos-embed resampling,
feature_fusion.py:167-172 bicubic feature upsampling)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.ops.resize import bicubic_resize, bilinear_resize  # noqa: E402


def _torch_resize(x_hwc, out_hw, mode, scale=None):
    t = torch.as_tensor(x_hwc).permute(2, 0, 1).unsqueeze(0)  # (1,C,H,W)
    if scale is not None:
        y = F.interpolate(t, scale_factor=scale, mode=mode,
                          align_corners=False, recompute_scale_factor=False)
    else:
        y = F.interpolate(t, size=tuple(out_hw), mode=mode, align_corners=False)
    return y.squeeze(0).permute(1, 2, 0).numpy()


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
@pytest.mark.parametrize("inout", [((7, 9), (21, 13)), ((16, 16), (24, 32)),
                                   ((24, 24), (11, 5)), ((5, 5), (5, 5))])
def test_resize_matches_torch(rng, mode, inout):
    (h, w), (oh, ow) = inout
    x = rng.randn(h, w, 3).astype(np.float32)
    want = _torch_resize(x, (oh, ow), mode)
    fn = bicubic_resize if mode == "bicubic" else bilinear_resize
    got = np.asarray(fn(jnp.asarray(x), (oh, ow)))
    assert np.max(np.abs(got - want)) < 1e-4, np.max(np.abs(got - want))


def test_bicubic_scale_factor_semantics(rng):
    """The DINO +0.1 trick passes scale != out/in; torch keeps the given
    scale for coordinate mapping (recompute_scale_factor=False)."""
    h = w = 24
    x = rng.randn(h, w, 8).astype(np.float32)
    w0, h0 = 16 + 0.1, 32 + 0.1
    scale = (w0 / h, h0 / w)
    want = _torch_resize(x, None, "bicubic", scale=scale)
    got = np.asarray(bicubic_resize(jnp.asarray(x), (int(w0), int(h0)),
                                    scale_hw=scale))
    assert want.shape == got.shape == (16, 32, 8)
    assert np.max(np.abs(got - want)) < 1e-4


def test_batched_resize(rng):
    x = rng.randn(2, 10, 12, 4).astype(np.float32)
    got = np.asarray(bicubic_resize(jnp.asarray(x), (20, 6)))
    assert got.shape == (2, 20, 6, 4)
    for b in range(2):
        want = _torch_resize(x[b], (20, 6), "bicubic")
        assert np.max(np.abs(got[b] - want)) < 1e-4


def test_channel_first_layout(rng):
    x = rng.randn(3, 8, 8).astype(np.float32)  # (C, H, W) -> treat HW as last
    got = np.asarray(bilinear_resize(jnp.asarray(x), (16, 4), channel_last=False))
    want = _torch_resize(np.transpose(x, (1, 2, 0)), (16, 4), "bilinear")
    assert np.max(np.abs(np.transpose(got, (1, 2, 0)) - want)) < 1e-4
