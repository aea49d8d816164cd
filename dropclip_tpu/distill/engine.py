"""Train / eval steps as single XLA programs over the device mesh.

The reference's hot loop (engine/distil.py:99-230) is: H2D copy, build an
ME sparse tensor, UNet forward under AMP, cosine loss (+ optional aux
hinge / cls-head CE), scaled backward with DDP all-reduce, grad clip,
per-iteration cosine LR step. Here the whole iteration — topology build,
forward, loss, grads, optimizer — is ONE jit program; with the batch
sharded on the mesh's data axis, XLA inserts the gradient/batch-norm
all-reduces over ICI (replacing NCCL DDP + SyncBN).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..sparse.bricks import build_brick_topology
from ..sparse.topology import build_unet_topology
from .loss import (aux_hinge_loss, cosine_distil_loss, cross_entropy_cls_loss,
                   l1_distil_loss)
from .train_state import DistilTrainState


def build_topology(cfg, coords, mask):
    """Backend dispatch: 'bricks' (default, brick-dense engine — the fast
    TPU path) or 'gather' (per-voxel kernel maps — the reference-parity
    baseline). Both UNets share parameter trees (tests/test_unet_bricks)."""
    backend = cfg.sparse_backend or "bricks"
    num_levels = int(cfg.num_levels or 5)
    if backend == "bricks":
        caps = cfg.brick_capacities  # static per-level brick counts,
        # autotuned from data (sparse.bricks.autotune_brick_capacities);
        # None -> the conservative M//8 heuristic
        return build_brick_topology(
            coords, mask, num_levels=num_levels,
            brick_capacities=tuple(caps) if caps else None,
            brick_shape=brick_shape_of(cfg))
    return build_unet_topology(coords, mask, num_levels=num_levels)


def brick_shape_of(cfg) -> tuple:
    """cfg.brick_shape ([4, 4, 2] or "4,4,2") -> static tuple.

    (4, 4, 2) is the tabletop-tuned shape — z-thin scenes double their
    per-brick occupancy, measured 1.6x on the full UNet forward (PERF.md);
    the canonical configs set it. Default isotropic (4, 4, 4)."""
    bs = cfg.brick_shape
    if bs is None:
        return (4, 4, 4)
    if isinstance(bs, str):
        bs = bs.split(",")
    return tuple(int(v) for v in bs)


def build_student_for(cfg):
    """Student factory honoring cfg.sparse_backend."""
    if (cfg.sparse_backend or "bricks") == "bricks":
        from ..sparse.unet_bricks import build_student_bricks

        return build_student_bricks(cfg)
    from ..sparse.unet import build_student

    return build_student(cfg)


class DistilBatch(NamedTuple):
    """One padded device batch.

    coords: (B, M, 3) int32 voxel coords; mask: (B, M) occupancy.
    in_feats: (B, M, Cin) xyz(+rgb) inputs; targets: (B, M, F) fused teacher
    features; labels: (B, M) instance ids; labels_cls: (B, M) class ids.
    """

    coords: jnp.ndarray
    mask: jnp.ndarray
    in_feats: jnp.ndarray
    targets: jnp.ndarray
    labels: jnp.ndarray
    labels_cls: jnp.ndarray


def _compute_losses(model_out, batch: DistilBatch, cfg) -> Tuple[jnp.ndarray, Dict]:
    use_cls = bool(cfg.use_cls_head)
    out = model_out[0] if use_cls else model_out

    loss_type = cfg.loss_type or "cosine"
    if loss_type == "cosine":
        dloss = cosine_distil_loss(out, batch.targets, batch.mask)
    elif loss_type == "l1":
        dloss = l1_distil_loss(out, batch.targets, batch.mask)
    else:
        raise NotImplementedError(loss_type)

    loss = dloss
    metrics = {"distil_loss": dloss}

    if cfg.use_aux_loss:
        max_labels = int(cfg.max_objects or 32)
        pos, mar = aux_hinge_loss(out, batch.labels, batch.mask, max_labels)
        # baseline hinge from the targets, stop-gradient (reference
        # engine/distil.py:176-182: aux = pos + clip(margin - margin_base, 0))
        _, mar_base = aux_hinge_loss(jax.lax.stop_gradient(batch.targets),
                                     batch.labels, batch.mask, max_labels)
        aux = (pos + jnp.clip(mar - jax.lax.stop_gradient(mar_base), 0.0))
        aux = aux * float(cfg.loss_weight_aux or 1.0)
        loss = loss + aux
        metrics["aux_loss"] = aux
    elif use_cls:
        logits = model_out[1]
        xloss = cross_entropy_cls_loss(logits, batch.labels_cls, batch.mask,
                                       ignore_label=int(cfg.ignore_label or 255))
        xloss = xloss * float(cfg.loss_weight_cls or 1.0)
        loss = loss + xloss
        metrics["aux_loss"] = xloss

    metrics["total_loss"] = loss
    return loss, metrics


def make_train_step(cfg):
    """Returns train_step(state, batch, dropout_rng) -> (state, metrics).

    jit-compatible; shard ``batch`` on the data axis for multi-chip DP.
    """
    def train_step(state: DistilTrainState, batch: DistilBatch,
                   dropout_rng: Optional[jax.Array] = None):
        topo = build_topology(cfg, batch.coords, batch.mask)

        def loss_fn(params):
            rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                topo, batch.in_feats, train=True,
                mutable=["batch_stats"], rngs=rngs)
            loss, metrics = _compute_losses(out, batch, cfg)
            return loss, (metrics, updates["batch_stats"])

        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics["grad_norm"] = optax_global_norm(grads)
        metrics["dropped_voxels"] = topology_dropped(topo)
        return new_state, metrics

    return train_step


def make_scanned_train(cfg):
    """Scan ``train_step`` over a precomputed scene-index schedule in ONE
    XLA program — the whole multi-epoch loop becomes a handful of device
    dispatches.

    A per-step python loop pays one dispatch (and, through a tunneled
    device, one network round-trip) plus host-side batch assembly per
    optimizer step; for the reference's small-batch distillation recipe
    (engine/distil.py:99-230: bsz 4-8, hundreds of epochs) that overhead
    dominates wall clock. Here the caller pre-stages the whole padded
    static-shape dataset as one DistilBatch with a leading scene axis and
    passes the shuffle order as data:

      data:     DistilBatch, each field (n_scenes, ...)
      schedule: (steps, B) int32 — row t holds the scene indices of step t
      key:      dropout PRNG key; the scan body performs the same
                ``key, sub = jax.random.split(key)`` chain a python loop
                would, so trajectories are reproduced exactly.

    Returns ``train_chunk(state, data, schedule, key) -> (state, key,
    metrics)`` with every step's scalar metrics stacked on axis 0. Chunk
    the schedule (e.g. 25 epochs per call) to keep progress visible and
    memory for stacked metrics trivial; jit with ``donate_argnums=0`` so
    the state buffers are reused across chunks.
    """
    train_step = make_train_step(cfg)

    def train_chunk(state: DistilTrainState, data: DistilBatch,
                    schedule: jnp.ndarray, key: jax.Array):
        def body(carry, idx):
            state, key = carry
            key, sub = jax.random.split(key)
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
            state, metrics = train_step(state, batch, sub)
            return (state, key), metrics

        (state, key), metrics = jax.lax.scan(body, (state, key), schedule)
        return state, key, metrics

    return train_chunk


def topology_dropped(topo) -> jnp.ndarray:
    """Scalar count of units the topology silently truncated (capacity
    overflow / out-of-extent — sparse/bricks.py ``BrickTopology.dropped``).
    0 for backends that don't truncate (gather)."""
    d = getattr(topo, "dropped", None)
    if d is None:
        return jnp.zeros((), jnp.int32)
    return jnp.sum(d)


def make_eval_step(cfg):
    """Returns eval_step(state, batch) -> (out_features, metrics)."""
    def eval_step(state: DistilTrainState, batch: DistilBatch):
        topo = build_topology(cfg, batch.coords, batch.mask)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            topo, batch.in_feats, train=False)
        if cfg.use_cls_head:
            out = out[0]
        dloss = cosine_distil_loss(out, batch.targets, batch.mask)
        return out, {"distil_loss": dloss,
                     "dropped_voxels": topology_dropped(topo)}

    return eval_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
