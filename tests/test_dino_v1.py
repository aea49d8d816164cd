"""Golden tests: DINO v1 hi-res ViTExtractor vs a torch transliteration.

The torch model below mirrors the reference's hook-based extractor
(reference models/features/dino/dino_vit_extractor.py:17-325) on a tiny
DINO v1 ViT: fused-qkv pre-norm blocks, stride-patched patch conv, the
+0.1 positional-interpolation trick, the per-(y,x) _log_bin loop, and
the cls-attention saliency recipe.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.teachers.dino_v1 import (  # noqa: E402
    ViTExtractor,
    build_dino_v1,
    from_dino_v1,
    log_bin,
)

D, LAYERS, HEADS, P, RES, STRIDE = 32, 2, 4, 4, 16, 2


class _TorchAttn(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(D, 3 * D)
        self.proj = nn.Linear(D, D)

    def forward(self, x):
        b, t, d = x.shape
        hd = d // HEADS
        qkv = self.qkv(x).reshape(b, t, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(out), {"query": q, "key": k, "value": v,
                                "attn": attn}


class _TorchMlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(D, 4 * D)
        self.fc2 = nn.Linear(4 * D, D)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _TorchBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.attn = _TorchAttn()
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.mlp = _TorchMlp()

    def forward(self, x):
        a, facets = self.attn(self.norm1(x))
        x = x + a
        x = x + self.mlp(self.norm2(x))
        facets["token"] = x
        return x, facets


class _TorchPatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Conv2d(3, D, kernel_size=P, stride=STRIDE)


class _TorchViT(nn.Module):
    """DINO v1 ViT with the reference's stride-patched pos interpolation."""

    def __init__(self):
        super().__init__()
        self.patch_embed = _TorchPatchEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
        n = (RES // P) ** 2
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, D))
        self.blocks = nn.ModuleList([_TorchBlock() for _ in range(LAYERS)])
        self.norm = nn.LayerNorm(D, eps=1e-6)

    def interpolate_pos_encoding(self, x, w, h):
        # transliteration of reference _fix_pos_enc (:97-121); w is the
        # image HEIGHT in the facebook convention (B, C, w, h)
        npatch = x.shape[1] - 1
        n = self.pos_embed.shape[1] - 1
        if npatch == n and w == h:
            return self.pos_embed
        class_pos_embed = self.pos_embed[:, 0]
        patch_pos_embed = self.pos_embed[:, 1:]
        dim = x.shape[-1]
        w0 = 1 + (w - P) // STRIDE
        h0 = 1 + (h - P) // STRIDE
        assert w0 * h0 == npatch
        w0, h0 = w0 + 0.1, h0 + 0.1
        patch_pos_embed = F.interpolate(
            patch_pos_embed.reshape(1, int(math.sqrt(n)), int(math.sqrt(n)),
                                    dim).permute(0, 3, 1, 2),
            scale_factor=(w0 / math.sqrt(n), h0 / math.sqrt(n)),
            mode="bicubic", align_corners=False,
            recompute_scale_factor=False)
        patch_pos_embed = patch_pos_embed.permute(0, 2, 3, 1).reshape(
            1, -1, dim)
        return torch.cat((class_pos_embed.unsqueeze(0), patch_pos_embed),
                         dim=1)

    def forward(self, x, capture_layer):
        b, _, w, h = x.shape
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat((self.cls_token.expand(b, -1, -1), x), dim=1)
        x = x + self.interpolate_pos_encoding(x, w, h)
        captured = None
        for i, blk in enumerate(self.blocks):
            x, facets = blk(x)
            if i == capture_layer:
                captured = facets
        return self.norm(x), captured


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = _TorchViT().eval()
    with torch.no_grad():
        tm.cls_token.normal_(std=0.5)
        tm.pos_embed.normal_(std=0.5)
    ex = ViTExtractor("tiny-test", stride=STRIDE,
                      variables={"params": from_dino_v1(tm.state_dict())})
    return tm, ex


def _px(rng, h=16, w=20):
    return rng.randn(2, h, w, 3).astype(np.float32)


@pytest.mark.parametrize("facet", ["key", "query", "value", "attn"])
def test_facets_match_torch(rng, models, facet):
    tm, ex = models
    px = _px(rng)
    with torch.no_grad():
        _, facets = tm(torch.as_tensor(px.transpose(0, 3, 1, 2)), 1)
    got = ex._run(px, layer=1, facet=facet)
    assert np.max(np.abs(np.asarray(got) - facets[facet].numpy())) < 1e-4
    assert ex.num_patches == (7, 9)


def test_token_descriptors_match(rng, models):
    tm, ex = models
    px = _px(rng)
    with torch.no_grad():
        _, facets = tm(torch.as_tensor(px.transpose(0, 3, 1, 2)), 0)
    desc = ex.extract_descriptors(px, layer=0, facet="token")
    want = facets["token"][:, 1:].numpy()
    assert desc.shape == (2, 1, 63, D)
    assert np.max(np.abs(np.asarray(desc[:, 0]) - want)) < 1e-4


def test_key_descriptor_layout(rng, models):
    """Non-binned descriptors flatten (d, h)-major like the reference
    permute(0,2,3,1).flatten(-2) (:306)."""
    _, ex = models
    px = _px(rng)
    x = ex._run(px, layer=1, facet="key")  # (B, h, t, hd)
    desc = ex.extract_descriptors(px, layer=1, facet="key")
    want = np.transpose(np.asarray(x)[:, :, 1:], (0, 2, 3, 1)).reshape(
        2, 63, -1)
    assert np.allclose(np.asarray(desc[:, 0]), want, atol=1e-6)
    with_cls = ex.extract_descriptors(px, layer=1, facet="key",
                                      include_cls=True)
    assert with_cls.shape == (2, 1, 64, D)


def _log_bin_reference(x, num_patches, hierarchy=2):
    """Transliteration of reference _log_bin (:237-283)."""
    x = torch.as_tensor(x)
    B = x.shape[0]
    num_bins = 1 + 8 * hierarchy
    bin_x = x.permute(0, 2, 3, 1).flatten(start_dim=-2, end_dim=-1)
    bin_x = bin_x.permute(0, 2, 1)
    bin_x = bin_x.reshape(B, bin_x.shape[1], num_patches[0], num_patches[1])
    sub = bin_x.shape[1]
    avg_pools = []
    for k in range(hierarchy):
        win = 3 ** k
        avg_pools.append(nn.AvgPool2d(win, stride=1, padding=win // 2,
                                      count_include_pad=False)(bin_x))
    out = torch.zeros(B, sub * num_bins, num_patches[0], num_patches[1])
    for y in range(num_patches[0]):
        for xx in range(num_patches[1]):
            part = 0
            for k in range(hierarchy):
                ks = 3 ** k
                for i in range(y - ks, y + ks + 1, ks):
                    for j in range(xx - ks, xx + ks + 1, ks):
                        if i == y and j == xx and k != 0:
                            continue
                        ti = max(0, min(i, num_patches[0] - 1))
                        tj = max(0, min(j, num_patches[1] - 1))
                        out[:, part * sub:(part + 1) * sub, y, xx] = \
                            avg_pools[k][:, :, ti, tj]
                        part += 1
    return out.flatten(start_dim=-2).permute(0, 2, 1).unsqueeze(1).numpy()


def test_log_bin_matches_reference_loop(rng):
    x = rng.randn(2, 3, 5 * 6, 4).astype(np.float32)  # (B, h, t-1, d)
    want = _log_bin_reference(x, (5, 6))
    got = log_bin(jnp.asarray(x), (5, 6))
    assert got.shape == (2, 1, 30, 17 * 12)
    assert np.max(np.abs(np.asarray(got) - want)) < 1e-5


def test_binned_descriptors(rng, models):
    _, ex = models
    px = _px(rng)
    desc = ex.extract_descriptors(px, layer=1, facet="key", bin=True)
    assert desc.shape == (2, 1, 63, 17 * D)
    x = ex._run(px, layer=1, facet="key")
    want = _log_bin_reference(np.asarray(x)[:, :, 1:], (7, 9))
    assert np.max(np.abs(np.asarray(desc) - want)) < 1e-4
    with pytest.raises(ValueError):
        ex.extract_descriptors(px, bin=True, include_cls=True)


def test_saliency(rng, models):
    tm, ex = models
    px = _px(rng)
    sal = ex.extract_saliency_maps(px)
    with torch.no_grad():
        _, facets = tm(torch.as_tensor(px.transpose(0, 3, 1, 2)), 1)
    cls_attn = facets["attn"][:, [0, 2], 0, 1:].mean(dim=1)
    lo = cls_attn.min(dim=1, keepdim=True)[0]
    hi = cls_attn.max(dim=1, keepdim=True)[0]
    want = ((cls_attn - lo) / (hi - lo)).numpy()
    assert sal.shape == (2, 63)
    assert np.max(np.abs(np.asarray(sal) - want)) < 1e-4
    assert float(sal.min()) == 0.0 and float(sal.max()) == 1.0


def test_stride_must_divide():
    with pytest.raises(ValueError):
        m = build_dino_v1("tiny-test", stride=3)
        import jax

        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))


def test_preprocess(rng, models):
    _, ex = models
    img = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
    x = ex.preprocess(img, load_size=16)
    assert x.shape == (1, 16, 20, 3)
    assert abs(float(x.mean())) < 2.0


def test_use_flash_attn_capture_parity(rng):
    """With use_flash=True, a layer whose 'attn' facet is captured takes
    the explicit-probability path — identical to use_flash=False (the
    Pallas path for non-captured layers is covered by test_attention's
    kernel parity + TPU runs; CPU auto-switch keeps use_flash off)."""
    import jax

    from dropclip_tpu.teachers.dino_v1 import DinoV1ViT

    kw = dict(width=32, layers=1, heads=4, patch_size=4, stride=2,
              image_resolution=16)
    px = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    base = DinoV1ViT(use_flash=False, **kw)
    v = base.init(jax.random.PRNGKey(0), px)
    out0, c0 = base.apply(v, px, capture=((0, "attn"),))
    fast = DinoV1ViT(use_flash=True, **kw)
    out1, c1 = fast.apply(v, px, capture=((0, "attn"),))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
    np.testing.assert_array_equal(np.asarray(c0[(0, "attn")]),
                                  np.asarray(c1[(0, "attn")]))
