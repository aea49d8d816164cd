"""MinkUNet on the pillar engine — inference backend for volumetric data.

Same architecture, parameter NAMES and parameter SHAPES as sparse.unet
.MinkUNet and sparse.unet_bricks.MinkUNetBricks (kernels stay
``(K^3, Cin, Cout)`` in lexicographic offset order), so checkpoints
trained on any engine load into this one; outputs agree to numerical
tolerance (tests/test_unet_pillars.py). Reference architecture:
models/distil/minkunet.py:30-263 + resnet_base.py:82-118.

Engine role (PERF.md "Volumetric inversion"): bricks stay the
production train/infer path for z-thin tabletop scenes; the pillar
layout wins end-to-end (measured 1.22x) where z columns run deep
(bin/shelf volumetric data). This module makes that measured kernel
regime a usable student: single-scene inference forward over a
host-built PillarTopology. The k3 stages take the fused Pallas kernel
(pallas_pillar.pallas_pillar_conv3) when ``use_pallas`` and the level
shape qualifies (Z % 8 == 0, C/Cout % 128 == 0 — production widths at
the top levels); everywhere else the XLA formulation runs.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pillar_ops import pillar_conv_xla, pillar_down_conv, pillar_up_conv
from .pillar_topology import (PillarTopology, gather_points_pillar,
                              scatter_points_pillar)
from .unet import UNET_ARCHS, MaskedBatchNorm, _kaiming_fan_out


def _bn(name: str, x, occ, train):
    """MaskedBatchNorm over (P, Z, C) pillar tensors — same param paths
    as the other engines (norm1/scale, not norm1/bn/scale)."""
    y = MaskedBatchNorm(name=name)(x.reshape(-1, x.shape[-1]),
                                   occ.reshape(-1), train)
    return y.reshape(x.shape)


class PConv(nn.Module):
    """Odd-kernel submanifold pillar conv (canonical (K^3, C, Co) param)."""

    features: int
    ksize: int = 3
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, level):
        k = self.ksize
        w = self.param("kernel", _kaiming_fan_out,
                       (k ** 3, x.shape[-1], self.features))
        wk = w.reshape(k * k, k, x.shape[-1], self.features).astype(x.dtype)
        nbr = level.nbr9 if k == 3 else None
        assert nbr is not None or k == 5, k
        if k == 5:
            raise ValueError("k5 uses the topology's nbr25 via PConv5")
        z = x.shape[1]
        if (self.use_pallas and k == 3 and z % 8 == 0
                and x.shape[-1] % 128 == 0 and self.features % 128 == 0):
            from .pallas_pillar import pallas_pillar_conv3

            ones = jnp.ones((self.features,), jnp.float32)
            zeros = jnp.zeros((self.features,), jnp.float32)
            return pallas_pillar_conv3(
                x, nbr, wk, jnp.ones(level.occ.shape, bool), ones, zeros,
                relu=False, interpret=jax.default_backend() != "tpu")
        return pillar_conv_xla(x, nbr, wk)


class PConv5(nn.Module):
    """Stem k5 conv via the level-0 nbr25 table."""

    features: int

    @nn.compact
    def __call__(self, x, nbr25):
        w = self.param("kernel", _kaiming_fan_out,
                       (125, x.shape[-1], self.features))
        return pillar_conv_xla(
            x, nbr25, w.reshape(25, 5, x.shape[-1], self.features)
            .astype(x.dtype))


class PConvDown(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, child):
        w = self.param("kernel", _kaiming_fan_out,
                       (8, x.shape[-1], self.features))
        return pillar_down_conv(
            x, child, w.reshape(4, 2, x.shape[-1], self.features)
            .astype(x.dtype))


class PConvUp(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, parent, parity):
        w = self.param("kernel", _kaiming_fan_out,
                       (8, x.shape[-1], self.features))
        return pillar_up_conv(
            x, parent, parity, w.reshape(4, 2, x.shape[-1], self.features)
            .astype(x.dtype))


class PConv1x1(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, occ):
        w = self.param("kernel", _kaiming_fan_out,
                       (1, x.shape[-1], self.features))
        y = jnp.einsum("pzc,co->pzo", x, w[0].astype(x.dtype))
        return y * occ[..., None].astype(x.dtype)


class PBasicBlock(nn.Module):
    planes: int
    expansion: int = 1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, level, train):
        residual = x
        occ = level.occ
        out = PConv(self.planes, use_pallas=self.use_pallas,
                    name="conv1")(x, level)
        out = jax.nn.relu(_bn("norm1", out, occ, train))
        out = PConv(self.planes, use_pallas=self.use_pallas,
                    name="conv2")(out, level)
        out = _bn("norm2", out, occ, train)
        if x.shape[-1] != self.planes * self.expansion:
            residual = PConv1x1(self.planes * self.expansion,
                                name="downsample_conv")(x, occ)
            residual = _bn("downsample_norm", residual, occ, train)
        return jax.nn.relu(out + residual)


class PBottleneck(nn.Module):
    planes: int
    expansion: int = 4
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, level, train):
        residual = x
        occ = level.occ
        out = PConv1x1(self.planes, name="conv1")(x, occ)
        out = jax.nn.relu(_bn("norm1", out, occ, train))
        out = PConv(self.planes, use_pallas=self.use_pallas,
                    name="conv2")(out, level)
        out = jax.nn.relu(_bn("norm2", out, occ, train))
        out = PConv1x1(self.planes * self.expansion, name="conv3")(out, occ)
        out = _bn("norm3", out, occ, train)
        if x.shape[-1] != self.planes * self.expansion:
            residual = PConv1x1(self.planes * self.expansion,
                                name="downsample_conv")(x, occ)
            residual = _bn("downsample_norm", residual, occ, train)
        return jax.nn.relu(out + residual)


_BLOCKS_P = {"basic": (PBasicBlock, 1), "bottleneck": (PBottleneck, 4)}


class MinkUNetPillars(nn.Module):
    """MinkUNet forward over a PillarTopology (single scene, inference
    orientation — train works numerically but the engine is deployed
    eval-side; the brick engine owns the training path)."""

    out_channels: int
    block: str = "basic"
    layers: Tuple[int, ...] = (1,) * 8
    planes: Tuple[int, ...] = (32, 64, 128, 256, 384, 384, 384, 384)
    init_dim: int = 32
    use_pallas: bool = False

    def _stage(self, name, x, level, n_blocks, planes, train):
        block_cls, _ = _BLOCKS_P[self.block]
        for i in range(n_blocks):
            x = block_cls(planes, use_pallas=self.use_pallas,
                          name=f"{name}_{i}")(x, level, train)
        return x

    @nn.compact
    def __call__(self, topo: PillarTopology, x: jnp.ndarray,
                 train: bool = False):
        P, L = self.planes, self.layers
        lvls = topo.levels
        dense = scatter_points_pillar(x, topo)

        out = PConv5(self.init_dim, name="conv0p1s1")(dense, topo.nbr25)
        out_p1 = jax.nn.relu(_bn("bn0", out, lvls[0].occ, train))

        skips = []
        out = out_p1
        for s in range(4):
            out = PConvDown(out.shape[-1], name=f"conv{s+1}")(
                out, topo.child[s])
            out = jax.nn.relu(_bn(f"bn{s+1}", out, lvls[s + 1].occ, train))
            out = self._stage(f"block{s+1}", out, lvls[s + 1], L[s], P[s],
                              train)
            skips.append(out)

        skip_feats = [skips[2], skips[1], skips[0], out_p1]
        for d in range(4):
            lvl = 3 - d
            out = PConvUp(P[4 + d], name=f"convtr{4+d}")(
                out, topo.parent[lvl], topo.xy_parity[lvl])
            out = jax.nn.relu(_bn(f"bntr{4+d}", out, lvls[lvl].occ, train))
            out = jnp.concatenate([out, skip_feats[d]], axis=-1)
            out = self._stage(f"block{5+d}", out, lvls[lvl], L[4 + d],
                              P[4 + d], train)

        feats = PConv1x1(self.out_channels, name="final")(out, lvls[0].occ)
        return gather_points_pillar(feats, topo)


def build_student_pillars(cfg) -> MinkUNetPillars:
    """Pillar-backend DisNet factory (same archs as unet.build_student).

    Inference engine: no dropout/cls-head (eval-path options the serve
    pipeline never uses; the brick engine owns training)."""
    arch = cfg.arch_3d or "MinkUNet14D"
    if arch not in UNET_ARCHS:
        raise ValueError(f"architecture {arch} not supported")
    block, layers, planes = UNET_ARCHS[arch]
    if cfg.planes is not None:
        planes = tuple(int(p) for p in cfg.planes)
    if cfg.layers is not None:
        layers = tuple(int(l) for l in cfg.layers)
    assert not cfg.use_cls_head, "pillar engine: inference features only"
    return MinkUNetPillars(
        out_channels=int(cfg.feat_dim or 768),
        block=block, layers=layers, planes=planes,
        init_dim=int(cfg.init_dim or 32))
