"""Sparse MinkUNet family in flax, on the static topology of topology.py.

Architecture parity with reference models/distil/minkunet.py:30-263 and
models/distil/resnet_base.py:82-118 (blocks), including the MinkUNet14D
default student (PLANES (32,64,128,256,384,384,384,384), LAYERS (1,)*8,
stem k=5, four k2s2 down-convs, four k2s2 transposed up-convs with skip
concats, 1x1 head; reference config/DistilBlender.yaml:43).

TPU-first differences from the reference:
- all feature arrays are (B, M, C) fixed-capacity with masks; batch norm
  computes masked moments over the *global* batch, so under pjit with the
  batch sharded on the data axis the jnp.sums become cross-replica — i.e.
  SyncBatchNorm (reference tools/train_distil.py:124-126) falls out of the
  sharding instead of being a special wrapper;
- parameters live in bf16-friendly layouts; convs accumulate in f32.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .ops import sparse_conv, sparse_conv_transpose
from .topology import UNetTopology


def _kaiming_fan_out(key, shape, dtype=jnp.float32):
    """Kaiming-normal, fan_out, relu gain — ME.utils.kaiming_normal_ analogue
    (reference models/distil/resnet_base.py:73-77). shape (K, Cin, Cout)."""
    fan_out = shape[0] * shape[-1]
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels of the whole (possibly sharded) batch.

    torch-convention momentum (new = (1-m)*old + m*batch, m=0.1) and eps,
    unbiased running variance — matching ME.MinkowskiBatchNorm defaults so
    training recipes transfer.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if train:
            w = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * w, axis=tuple(range(x.ndim - 1))) / n
            var = jnp.sum(w * (xf - mean) ** 2,
                          axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(x.dtype) + self.eps)
        y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y * mask[..., None].astype(x.dtype)


class SparseConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, nbr_map, out_mask):
        k = nbr_map.shape[-2]
        w = self.param("kernel", _kaiming_fan_out, (k, x.shape[-1], self.features))
        return sparse_conv(x, nbr_map, w.astype(x.dtype), out_mask)


class SparseConvTranspose(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, up_parent, up_offset, out_mask):
        w = self.param("kernel", _kaiming_fan_out, (8, x.shape[-1], self.features))
        return sparse_conv_transpose(x, up_parent, up_offset,
                                     w.astype(x.dtype), out_mask)


class Conv1x1(nn.Module):
    """Kernel-size-1 sparse conv == per-voxel matmul (no bias, like ME)."""

    features: int

    @nn.compact
    def __call__(self, x, out_mask):
        w = self.param("kernel", _kaiming_fan_out, (1, x.shape[-1], self.features))
        y = jnp.einsum("...mc,cd->...md", x, w[0].astype(x.dtype))
        return y * out_mask[..., None].astype(x.dtype)


class BasicBlock(nn.Module):
    """ME resnet BasicBlock: conv3-bn-relu-conv3-bn (+1x1 downsample) -relu."""

    planes: int
    expansion: int = 1

    @nn.compact
    def __call__(self, x, nbr_map, mask, train):
        residual = x
        out = SparseConv(self.planes, name="conv1")(x, nbr_map, mask)
        out = MaskedBatchNorm(name="norm1")(out, mask, train)
        out = jax.nn.relu(out)
        out = SparseConv(self.planes, name="conv2")(out, nbr_map, mask)
        out = MaskedBatchNorm(name="norm2")(out, mask, train)
        if x.shape[-1] != self.planes * self.expansion:
            residual = Conv1x1(self.planes * self.expansion,
                               name="downsample_conv")(x, mask)
            residual = MaskedBatchNorm(name="downsample_norm")(residual, mask, train)
        return jax.nn.relu(out + residual)


class Bottleneck(nn.Module):
    """ME resnet Bottleneck (1x1 -> 3x3 -> 1x1 with expansion 4)."""

    planes: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, nbr_map, mask, train):
        residual = x
        out = Conv1x1(self.planes, name="conv1")(x, mask)
        out = jax.nn.relu(MaskedBatchNorm(name="norm1")(out, mask, train))
        out = SparseConv(self.planes, name="conv2")(out, nbr_map, mask)
        out = jax.nn.relu(MaskedBatchNorm(name="norm2")(out, mask, train))
        out = Conv1x1(self.planes * self.expansion, name="conv3")(out, mask)
        out = MaskedBatchNorm(name="norm3")(out, mask, train)
        if x.shape[-1] != self.planes * self.expansion:
            residual = Conv1x1(self.planes * self.expansion,
                               name="downsample_conv")(x, mask)
            residual = MaskedBatchNorm(name="downsample_norm")(residual, mask, train)
        return jax.nn.relu(out + residual)


_BLOCKS = {"basic": (BasicBlock, 1), "bottleneck": (Bottleneck, 4)}


class MinkUNet(nn.Module):
    """Sparse UNet over a precomputed 5-level topology.

    __call__(topo, x, train) -> (B, M0, out_channels) masked features
    [+ (B, M0, n_classes) if use_cls_head].
    """

    out_channels: int
    block: str = "basic"
    layers: Tuple[int, ...] = (1,) * 8
    planes: Tuple[int, ...] = (32, 64, 128, 256, 384, 384, 384, 384)
    init_dim: int = 32
    dropout_rate: float = 0.0
    use_cls_head: bool = False
    n_classes: int = 0

    def _dropout(self, x, train):
        if self.dropout_rate > 0:
            return nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return x

    def _stage(self, name, x, nbr_map, mask, planes, n_blocks, train):
        block_cls, _ = _BLOCKS[self.block]
        for i in range(n_blocks):
            x = block_cls(planes, name=f"{name}_{i}")(x, nbr_map, mask, train)
        return x

    @nn.compact
    def __call__(self, topo: UNetTopology, x: jnp.ndarray, train: bool = False):
        _, expansion = _BLOCKS[self.block]
        masks = [lv.mask for lv in topo.levels]
        P, L = self.planes, self.layers

        # --- stem (stride 1)
        out = SparseConv(self.init_dim, name="conv0p1s1")(x, topo.stem_map, masks[0])
        out_p1 = jax.nn.relu(MaskedBatchNorm(name="bn0")(out, masks[0], train))

        # --- encoder: 4x (k2s2 down-conv + blocks)
        skips = []
        out = out_p1
        for s in range(4):
            out = SparseConv(out.shape[-1], name=f"conv{s+1}")(
                out, topo.down_maps[s], masks[s + 1])
            out = jax.nn.relu(MaskedBatchNorm(name=f"bn{s+1}")(out, masks[s + 1], train))
            out = self._dropout(
                self._stage(f"block{s+1}", out, topo.k3_maps[s + 1], masks[s + 1],
                            P[s], L[s], train), train)
            skips.append(out)

        # --- decoder: 4x (k2s2 transposed conv + skip concat + blocks)
        # skip sources: block3 (L3), block2 (L2), block1 (L1), stem (L0)
        skip_feats = [skips[2], skips[1], skips[0], out_p1]
        for d in range(4):
            lvl = 3 - d  # decode into level 3,2,1,0
            out = SparseConvTranspose(P[4 + d], name=f"convtr{4+d}")(
                out, topo.up_parent[lvl], topo.up_offset[lvl], masks[lvl])
            out = jax.nn.relu(MaskedBatchNorm(name=f"bntr{4+d}")(out, masks[lvl], train))
            out = jnp.concatenate([out, skip_feats[d]], axis=-1)
            out = self._dropout(
                self._stage(f"block{5+d}", out, topo.k3_maps[lvl], masks[lvl],
                            P[4 + d], L[4 + d], train), train)

        feats = Conv1x1(self.out_channels, name="final")(out, masks[0])
        if self.use_cls_head:
            logits = Conv1x1(self.n_classes, name="cls_head")(out, masks[0])
            return feats, logits
        return feats


# name -> (block, LAYERS, PLANES) — reference minkunet.py:197-263
UNET_ARCHS: Dict[str, Tuple[str, Tuple[int, ...], Tuple[int, ...]]] = {
    "MinkUNet14A": ("basic", (1,) * 8, (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet14B": ("basic", (1,) * 8, (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet14C": ("basic", (1,) * 8, (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet14D": ("basic", (1,) * 8, (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet18A": ("basic", (2,) * 8, (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18B": ("basic", (2,) * 8, (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet18C": ("basic", (2,) * 8, (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet18D": ("basic", (2,) * 8, (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet18E": ("basic", (2,) * 8, (96, 192, 384, 768, 384, 192, 96, 96)),
    "MinkUNet34A": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64)),
    "MinkUNet34B": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32)),
    "MinkUNet34C": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
    "MinkUNet50": ("bottleneck", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 384, 384, 384, 384)),
    # MinkUNet101 family. The reference declares bare MinkUNet50/101
    # classes with PLANES=None (models/distil/minkunet.py:212-219 — not
    # constructible, and absent from its mink_unet factory :266-289);
    # the base spec here is upstream MinkowskiNet's (Bottleneck,
    # LAYERS=(2,3,4,23,2,2,2,2), base PLANES (32,64,128,256,256,128,96,
    # 96)), and the A-E width variants follow the same progression the
    # 14/18 families use.
    "MinkUNet101": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
    "MinkUNet101A": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet101B": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet101C": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet101D": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet101E": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), (96, 192, 384, 768, 384, 192, 96, 96)),
    # miniature arch for tests/smoke runs (CPU-compilable in seconds)
    "tiny": ("basic", (1,) * 8, (4, 4, 8, 8, 8, 8, 4, 4)),
    # bottleneck twin of "tiny": CPU-fast coverage of the Bottleneck
    # branch (conv3 + the expansion-4 shapes) in round-trip/parity tests
    "tiny_bn": ("bottleneck", (1,) * 8, (4, 4, 8, 8, 8, 8, 4, 4)),
}


def build_student(cfg: Any) -> MinkUNet:
    """DisNet equivalent (reference models/distil/disnet.py:24-39): pick the
    3D arch; input features are xyz (+rgb if use_color), output feat_dim."""
    arch = cfg.arch_3d or "MinkUNet14D"
    if arch not in UNET_ARCHS:
        raise ValueError(f"architecture {arch} not supported")
    block, layers, planes = UNET_ARCHS[arch]
    # explicit width overrides (tiny CPU dryruns / ablations)
    if cfg.planes is not None:
        planes = tuple(int(p) for p in cfg.planes)
    if cfg.layers is not None:
        layers = tuple(int(l) for l in cfg.layers)
    return MinkUNet(
        out_channels=int(cfg.feat_dim or 768),
        block=block,
        layers=layers,
        planes=planes,
        init_dim=int(cfg.init_dim or 32),
        dropout_rate=float(cfg.dropout_rate or 0.0),
        use_cls_head=bool(cfg.use_cls_head),
        n_classes=int(cfg.n_classes or 0),
    )


# Back-compat alias: the reference calls the student wrapper DisNet.
DisNet = build_student
