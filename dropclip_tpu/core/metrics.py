"""Evaluation metrics, masked and batch-vectorized for accelerators.

Definitions match the reference exactly:
- grounding: per-query binary-mask IoU with a 0.35 binarization threshold and
  Pr@{0.25,0.5,0.75} (reference utils/misc.py:22-50 ``trainMetricPC``).
- segmentation: K-class histogram intersection/union with an ignore index
  (reference utils/misc.py:186-199 ``intersectionAndUnionGPU``).

Unlike the reference (a python loop over masks), these are single fused
XLA reductions over padded (Q, N) arrays with validity masks, so thousands
of queries are scored in one device program.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def grounding_metrics(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    query_mask: jnp.ndarray | None = None,
    point_mask: jnp.ndarray | None = None,
    threshold: float = 0.35,
    pr_ious: Sequence[float] = (0.25, 0.5, 0.75),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean IoU (%) and Pr@iou (%) over per-query binary 3D masks.

    Args:
      pred: (Q, N) float scores or binary predictions.
      target: (Q, N) bool/int ground-truth masks.
      query_mask: (Q,) bool — which query rows are real (padding excluded).
      point_mask: (Q, N) or (N,) bool — which points are real.
      threshold: binarization threshold applied to ``pred``.
      pr_ious: IoU thresholds for the precision metrics.

    Returns:
      (mean_iou_pct, pr_pct) with pr_pct shaped (len(pr_ious),).
    """
    pred = jnp.asarray(pred)
    target = jnp.asarray(target).astype(bool)
    if pred.ndim == 1:
        pred = pred[None]
        target = target[None]
    q = pred.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((q,), dtype=bool)
    if point_mask is None:
        point_mask = jnp.ones(pred.shape, dtype=bool)
    point_mask = jnp.broadcast_to(point_mask, pred.shape).astype(bool)

    pred_bin = (pred >= threshold) & point_mask
    target = target & point_mask

    inter = jnp.sum(pred_bin & target, axis=1)
    union = jnp.sum(pred_bin | target, axis=1)
    iou = inter / (union + 1e-6)

    qvalid = query_mask.astype(jnp.float32)
    # Reference accumulates count starting at 1e-6 then divides IoU by a
    # further +1e-6 (utils/misc.py:27-47); keep the same tiny bias so numbers
    # are bit-comparable against reference logs.
    count = jnp.sum(qvalid) + 1e-6
    mean_iou = jnp.sum(iou * qvalid) / (count + 1e-6)
    prs = jnp.stack([jnp.sum((iou > t) * qvalid) / count for t in pr_ious])
    return 100.0 * mean_iou, 100.0 * prs


def intersection_and_union(
    output: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
    valid_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class intersection/union/target histograms.

    Returns (area_intersection, area_union, area_target), each (num_classes,).
    Accumulate across batches then compute mIoU = mean(inter/union),
    mAcc = mean(inter/target), allAcc = sum(inter)/sum(target).
    """
    output = jnp.asarray(output).reshape(-1)
    target = jnp.asarray(target).reshape(-1)
    if valid_mask is not None:
        valid = valid_mask.reshape(-1).astype(bool)
    else:
        valid = jnp.ones(output.shape, dtype=bool)
    valid = valid & (target != ignore_index)

    # Out-of-range bin so masked elements fall outside the histogram.
    output = jnp.where(valid, output, num_classes)
    target = jnp.where(valid, target, num_classes)

    inter_vals = jnp.where(output == target, output, num_classes)
    area_inter = jnp.bincount(inter_vals, length=num_classes + 1)[:num_classes]
    area_out = jnp.bincount(output, length=num_classes + 1)[:num_classes]
    area_tgt = jnp.bincount(target, length=num_classes + 1)[:num_classes]
    area_union = area_out + area_tgt - area_inter
    return area_inter, area_union, area_tgt


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean of ``x`` over elements where ``mask`` is true."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1e-12)
