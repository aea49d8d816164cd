"""MinkUNet on the brick-dense engine (sparse.bricks) — the fast backend.

Same architecture, parameter names, and parameter SHAPES as sparse.unet.
MinkUNet (kernels stay (K, Cin, Cout) in lexicographic offset order), so
checkpoints trained on either backend load into the other; outputs agree
to numerical tolerance (tested in tests/test_bricks.py /
tests/test_unet_bricks.py). Reference architecture: models/distil/
minkunet.py:30-263 + resnet_base.py:82-118.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bricks import (BrickTopology, brick_conv, brick_down_conv,
                     brick_up_conv, fold_topology, gather_points,
                     scatter_points)
from .unet import UNET_ARCHS, MaskedBatchNorm, _kaiming_fan_out


def _auto_fold() -> bool:
    """Decide ``fold_batch`` when the model leaves it ``None``.

    Folding is safe exactly when the computation is NOT sharded over a
    data axis. The strongest trace-time signal is the active mesh (set
    by ``shard_map`` / ``with mesh:`` pjit contexts): a multi-device
    mesh means sharded, fold off. Without a mesh, fall back to the
    default backend's device count — a plain jit on a single chip folds
    even when other platforms (a CPU host next to the TPU) contribute
    extra visible devices (ADVICE r4: ``jax.device_count()`` made the
    program structure environment-dependent). When auto DISABLES the
    fold, say so at trace time: the ~20% single-chip infer win must
    never silently disappear."""
    fold = None
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and not getattr(m, "empty", True):
            fold = int(m.size) == 1
    except Exception:
        pass
    if fold is None:
        fold = jax.local_device_count() == 1
    if not fold:
        print("[unet_bricks] auto fold_batch=False (sharded/multi-device "
              "context); pass fold_batch=True for the folded single-device "
              "graph", flush=True)
    return fold


def _bn_view(x: jnp.ndarray) -> jnp.ndarray:
    """(B, Bm, bx,by,bz, C) -> (B, Bm*bv, C) for batch-norm over voxels.
    Folded tensors ((Bm', bx,by,bz, C), ndim 5) view as (Bm'*bv, C) —
    MaskedBatchNorm reduces every non-channel axis, so stats (and
    therefore results) are identical either way."""
    if x.ndim == 5:
        return x.reshape(-1, x.shape[-1])
    b = x.shape[0]
    return x.reshape(b, -1, x.shape[-1])


def _bn(name: str, x, occ, train):
    """MaskedBatchNorm over brick-dense tensors, created inline so the
    param path matches the gather backend exactly (norm1/scale, not
    norm1/bn/scale). Global batch stats == SyncBN (reference
    tools/train_distil.py:124-126)."""
    occ_view = occ.reshape(-1) if x.ndim == 5 else occ.reshape(x.shape[0], -1)
    y = MaskedBatchNorm(name=name)(_bn_view(x), occ_view, train)
    return y.reshape(x.shape)


class BConv(nn.Module):
    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x, level):
        k = self.ksize ** 3
        w = self.param("kernel", _kaiming_fan_out,
                       (k, x.shape[-1], self.features))
        if x.ndim == 5:  # folded: one brick axis (see bricks.fold_topology)
            return brick_conv(x, level, w.astype(x.dtype), ksize=self.ksize)
        return jax.vmap(lambda f, lv: brick_conv(f, lv, w.astype(f.dtype),
                                                 ksize=self.ksize))(x, level)


class BConvDown(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, group_map, coarse_level):
        w = self.param("kernel", _kaiming_fan_out,
                       (8, x.shape[-1], self.features))
        if x.ndim == 5:
            return brick_down_conv(x, group_map, coarse_level,
                                   w.astype(x.dtype))
        return jax.vmap(lambda f, g, lv: brick_down_conv(
            f, g, lv, w.astype(f.dtype)))(x, group_map, coarse_level)


class BConvUp(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, parent_map, octant, fine_level):
        w = self.param("kernel", _kaiming_fan_out,
                       (8, x.shape[-1], self.features))
        if x.ndim == 5:
            return brick_up_conv(x, parent_map, octant, fine_level,
                                 w.astype(x.dtype))
        return jax.vmap(lambda f, p, o, lv: brick_up_conv(
            f, p, o, lv, w.astype(f.dtype)))(x, parent_map, octant, fine_level)


class BConv1x1(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, occ):
        w = self.param("kernel", _kaiming_fan_out,
                       (1, x.shape[-1], self.features))
        y = jnp.einsum("...c,cd->...d", x, w[0].astype(x.dtype))
        return y * occ[..., None].astype(x.dtype)


class BasicBlockB(nn.Module):
    planes: int
    expansion: int = 1

    @nn.compact
    def __call__(self, x, level, train):
        residual = x
        out = BConv(self.planes, name="conv1")(x, level)
        out = _bn("norm1", out, level.occ, train)
        out = jax.nn.relu(out)
        out = BConv(self.planes, name="conv2")(out, level)
        out = _bn("norm2", out, level.occ, train)
        if x.shape[-1] != self.planes * self.expansion:
            residual = BConv1x1(self.planes * self.expansion,
                                name="downsample_conv")(x, level.occ)
            residual = _bn("downsample_norm", residual, level.occ, train)
        return jax.nn.relu(out + residual)


class BottleneckB(nn.Module):
    planes: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, level, train):
        residual = x
        out = BConv1x1(self.planes, name="conv1")(x, level.occ)
        out = jax.nn.relu(_bn("norm1", out, level.occ, train))
        out = BConv(self.planes, name="conv2")(out, level)
        out = jax.nn.relu(_bn("norm2", out, level.occ, train))
        out = BConv1x1(self.planes * self.expansion, name="conv3")(out,
                                                                   level.occ)
        out = _bn("norm3", out, level.occ, train)
        if x.shape[-1] != self.planes * self.expansion:
            residual = BConv1x1(self.planes * self.expansion,
                                name="downsample_conv")(x, level.occ)
            residual = _bn("downsample_norm", residual, level.occ, train)
        return jax.nn.relu(out + residual)


_BLOCKS_B = {"basic": (BasicBlockB, 1), "bottleneck": (BottleneckB, 4)}


class MinkUNetBricks(nn.Module):
    """__call__(topo: BrickTopology (batched), x (B, M, Cin), train) ->
    (B, M, out_channels) per-voxel features [+ logits if use_cls_head]."""

    out_channels: int
    block: str = "basic"
    layers: Tuple[int, ...] = (1,) * 8
    planes: Tuple[int, ...] = (32, 64, 128, 256, 384, 384, 384, 384)
    init_dim: int = 32
    dropout_rate: float = 0.0
    use_cls_head: bool = False
    n_classes: int = 0
    remat: bool = True  # rematerialize blocks in backward (trades ~30%
    # extra forward FLOPs for not holding halo/conv activations: the full
    # MinkUNet14D train step at batch 8 x 8192 voxels exceeds 16 GB HBM
    # without it). No effect on inference.
    fold_batch: Optional[bool] = None  # fold scenes into ONE brick axis
    # (bricks.fold_topology) so XLA never sees (B, Bm) 2-D leading dims —
    # removes the batched halo buffers' layout copies (~22% of the infer
    # step, PERF.md r4 re-audit). None = auto (see _auto_fold). MUST be
    # False under a sharded data axis (folded gathers defeat SPMD
    # locality — XLA all-gathers the operand).

    def _dropout(self, x, train):
        if self.dropout_rate > 0:
            return nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return x

    def _stage(self, name, x, level, n_blocks, planes, train):
        block_cls, _ = _BLOCKS_B[self.block]
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(3,))
        for i in range(n_blocks):
            x = block_cls(planes, name=f"{name}_{i}")(x, level, train)
        return x

    @nn.compact
    def __call__(self, topo: BrickTopology, x: jnp.ndarray,
                 train: bool = False):
        P, L = self.planes, self.layers
        cap0 = topo.levels[0].occ.shape[1]
        bshape0 = tuple(topo.levels[0].occ.shape[2:5])  # occ: (B, Bm, ...)
        conv_c = nn.remat(BConv) if self.remat else BConv
        down_c = nn.remat(BConvDown) if self.remat else BConvDown
        up_c = nn.remat(BConvUp) if self.remat else BConvUp

        fold = self.fold_batch
        if fold is None:
            fold = _auto_fold()
        if fold:
            bsz, m = x.shape[0], x.shape[1]
            topo = fold_topology(topo)
            dense = scatter_points(x.reshape(bsz * m, -1), topo.point_row,
                                   topo.point_within, bsz * cap0, bshape0)
        else:
            dense = jax.vmap(
                lambda f, r, w: scatter_points(f, r, w, cap0, bshape0))(
                x, topo.point_row, topo.point_within)
        lvls = topo.levels

        out = conv_c(self.init_dim, ksize=5, name="conv0p1s1")(dense, lvls[0])
        out_p1 = jax.nn.relu(_bn("bn0", out, lvls[0].occ, train))

        skips = []
        out = out_p1
        for s in range(4):
            out = down_c(out.shape[-1], name=f"conv{s+1}")(
                out, topo.group_maps[s], lvls[s + 1])
            out = jax.nn.relu(_bn(f"bn{s+1}", out, lvls[s + 1].occ, train))
            out = self._dropout(
                self._stage(f"block{s+1}", out, lvls[s + 1], L[s], P[s],
                            train), train)
            skips.append(out)

        skip_feats = [skips[2], skips[1], skips[0], out_p1]
        for d in range(4):
            lvl = 3 - d
            out = up_c(P[4 + d], name=f"convtr{4+d}")(
                out, topo.parent_maps[lvl], topo.octants[lvl], lvls[lvl])
            out = jax.nn.relu(_bn(f"bntr{4+d}", out, lvls[lvl].occ, train))
            out = jnp.concatenate([out, skip_feats[d]], axis=-1)
            out = self._dropout(
                self._stage(f"block{5+d}", out, lvls[lvl], L[4 + d], P[4 + d],
                            train), train)

        feats = BConv1x1(self.out_channels, name="final")(out, lvls[0].occ)
        if fold:
            def to_points(f, r, w):
                return gather_points(f, r, w).reshape(bsz, m, -1)
        else:
            to_points = jax.vmap(gather_points)
        if self.use_cls_head:
            logits = BConv1x1(self.n_classes, name="cls_head")(out,
                                                               lvls[0].occ)
            return (to_points(feats, topo.point_row, topo.point_within),
                    to_points(logits, topo.point_row, topo.point_within))
        return to_points(feats, topo.point_row, topo.point_within)


def build_student_bricks(cfg: Any) -> MinkUNetBricks:
    """Brick-backend DisNet factory (same archs as unet.build_student)."""
    arch = cfg.arch_3d or "MinkUNet14D"
    if arch not in UNET_ARCHS:
        raise ValueError(f"architecture {arch} not supported")
    block, layers, planes = UNET_ARCHS[arch]
    # explicit width overrides (tiny CPU dryruns / ablations)
    if cfg.planes is not None:
        planes = tuple(int(p) for p in cfg.planes)
    if cfg.layers is not None:
        layers = tuple(int(l) for l in cfg.layers)
    return MinkUNetBricks(
        out_channels=int(cfg.feat_dim or 768),
        block=block, layers=layers, planes=planes,
        init_dim=int(cfg.init_dim or 32),
        dropout_rate=float(cfg.dropout_rate or 0.0),
        use_cls_head=bool(cfg.use_cls_head),
        n_classes=int(cfg.n_classes or 0),
        remat=bool(cfg.remat) if cfg.remat is not None else True,
        fold_batch=(bool(cfg.fold_batch)
                    if cfg.fold_batch is not None else None))
