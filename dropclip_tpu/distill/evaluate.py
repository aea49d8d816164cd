"""Evaluation loops: grounding (text-query 3D masks) and semantic
segmentation — reference engine/distil.py:235-532 and
tools/validate_blender.py:80-263.

TPU-first structure: the host assembles each scene's queries into padded
(Qmax, ...) arrays (positives, per-query negative sets, ground-truth
masks), and ONE jitted program scores every query of the batch — the
reference calls CLIP.predict per query in a python loop.

Metric-accumulation note (reference bug, SURVEY §2.2): the reference
builds pred/gt lists per scene but scores only the LAST scene of each
batch (engine/distil.py:436-460, validate_blender.py:150-189). Here every
scene is scored; set ``compat_last_scene_only=True`` to reproduce the
reference's numbers exactly.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import grounding_metrics, intersection_and_union
from ..similarity import NEGATIVE_PROMPT_GENERIC, predict_from_embeddings

PR_IOUS = (0.25, 0.5, 0.75)


def scene_query_plan(obj_queries: Dict, sim_negatives: str = "generic",
                     cls_list: Optional[Sequence[str]] = None
                     ) -> List[Tuple[str, List[int], Optional[List[str]]]]:
    """Normalize a scene's query dict into (text, gt_obj_ids, negatives).

    Accepts both formats: Blender ``{obj_id: [texts]}``
    (validate_blender.py:154-189, one query per text, gt = that object)
    and REGRAD ``{name: [obj_ids]}`` (engine/distil.py:439-459, gt = union).
    """
    plan = []
    for key, val in obj_queries.items():
        if isinstance(key, (int, np.integer)):  # Blender: id -> texts
            if int(key) == 0:
                continue
            texts, gt_ids = list(val), [int(key)]
        else:  # REGRAD: name -> ids
            texts, gt_ids = [str(key)], [int(x) for x in val]
        for text in texts:
            if sim_negatives == "generic":
                negs: Optional[List[str]] = list(NEGATIVE_PROMPT_GENERIC)
            elif sim_negatives == "scene":
                negs = []
                for k2, v2 in obj_queries.items():
                    if k2 in (0, key):
                        continue
                    negs.extend(list(v2) if isinstance(key, (int, np.integer))
                                else [str(k2)])
            elif sim_negatives == "no":
                negs = None
            elif sim_negatives == "all":
                assert cls_list is not None, "sim_negatives=all needs cls_list"
                negs = [x for x in cls_list if x != text]
            else:
                raise ValueError(f"unknown sim_negatives {sim_negatives!r}")
            plan.append((text, gt_ids, negs))
    return plan


def make_grounding_scorer(method: str, threshold: float):
    """Jitted (out, mask, query arrays) -> per-scene (miou, prs)."""

    @jax.jit
    def score(out, mask, pos_embs, neg_embs, neg_masks, use_negs, gts, q_mask):
        def one(pos, negs, nmask, use_neg, gt):
            pred_n, _ = predict_from_embeddings(
                out, pos, negs, mask=mask, method=method, threshold=threshold,
                neg_mask=nmask)
            pred_0, _ = predict_from_embeddings(
                out, pos, None, mask=mask, method=method, threshold=threshold)
            return jnp.where(use_neg, pred_n, pred_0), gt & mask

        preds, gts_m = jax.vmap(one)(pos_embs, neg_embs, neg_masks, use_negs,
                                     gts)
        return grounding_metrics(preds.astype(jnp.float32), gts_m,
                                 query_mask=q_mask, point_mask=mask,
                                 pr_ious=PR_IOUS)

    return score


def _pad_queries(clip_sim, plan, labels: np.ndarray, q_cap: int, k_cap: int,
                 feat_dim: int):
    """Build padded (Qmax, ...) arrays for one scene's query plan."""
    q = len(plan)
    pos = np.zeros((q_cap, feat_dim), np.float32)
    negs = np.zeros((q_cap, k_cap, feat_dim), np.float32)
    nmask = np.zeros((q_cap, k_cap), bool)
    use_negs = np.zeros((q_cap,), bool)
    gts = np.zeros((q_cap, labels.shape[0]), bool)
    qmask = np.zeros((q_cap,), bool)
    for i, (text, gt_ids, neg_texts) in enumerate(plan[:q_cap]):
        pos[i] = np.asarray(clip_sim.encode_text([text])[0])
        if neg_texts is not None:
            neg_texts = neg_texts or list(NEGATIVE_PROMPT_GENERIC)
            k = min(len(neg_texts), k_cap)
            negs[i, :k] = np.asarray(clip_sim.encode_text(neg_texts))[:k]
            nmask[i, :k] = True
            use_negs[i] = True
        gts[i] = np.isin(labels, gt_ids)
        qmask[i] = True
    return pos, negs, nmask, use_negs, gts, qmask, q > q_cap


def validate_grounding(loader, forward: Callable, clip_sim, cfg,
                       cls_list: Optional[Sequence[str]] = None,
                       compat_last_scene_only: bool = False,
                       max_queries: int = 32, max_negatives: int = 64) -> Dict:
    """forward(batch_dict) -> (B, M, C) student features (or fused targets
    for the upper-bound eval, validate_upper_bound.py:191-192)."""
    method = cfg.sim_method or "paired"
    threshold = float(cfg.sim_norm_thresh or 0.7)
    scorer = make_grounding_scorer(method, threshold)
    sim_negatives = cfg.sim_negatives or "generic"

    ious, prs, dlosses = [], [], []
    dropped = 0
    for batch in loader:
        out, dloss = forward(batch)
        dlosses.append(float(dloss))
        b = out.shape[0]
        feat_dim = out.shape[-1]
        scene_range = [b - 1] if compat_last_scene_only else range(b)
        for s in scene_range:
            plan = scene_query_plan(batch["queries"][s], sim_negatives,
                                    cls_list)
            if not plan:
                continue
            labels = np.asarray(batch["labels"][s])
            pos, negs, nmask, use_negs, gts, qmask, over = _pad_queries(
                clip_sim, plan, labels, max_queries, max_negatives, feat_dim)
            dropped += int(over)
            miou, pr = scorer(out[s], jnp.asarray(batch["mask"][s]),
                              jnp.asarray(pos), jnp.asarray(negs),
                              jnp.asarray(nmask), jnp.asarray(use_negs),
                              jnp.asarray(gts), jnp.asarray(qmask))
            ious.append(float(miou))
            prs.append(np.asarray(pr))
    if dropped:
        print(f"[validate_grounding] {dropped} scenes exceeded "
              f"max_queries={max_queries}; extra queries skipped")
    prs = np.mean(np.stack(prs), axis=0) if prs else np.zeros(3)
    return {
        "mIoU": float(np.mean(ious)) if ious else 0.0,
        "Pr@25": float(prs[0]), "Pr@50": float(prs[1]), "Pr@75": float(prs[2]),
        "DistilLoss": float(np.mean(dlosses)) if dlosses else 0.0,
    }


def validate_segmentation(loader, forward: Callable, cls_embs: jnp.ndarray,
                          cfg) -> Dict:
    """Zero-shot semantic segmentation: per-point argmax over class text
    embeddings -> histogram mIoU/mAcc/allAcc (reference engine/distil.py:
    235-346). ``cls_embs``: (n_classes, C) UNnormalized text embeddings
    (normalized here, :245-247); batches must carry ``labels_cls``."""
    n_classes = int(cfg.n_classes)
    ignore = int(cfg.ignore_label or 255)
    cls_n = cls_embs / jnp.linalg.norm(cls_embs, axis=-1, keepdims=True)

    @jax.jit
    def seg_step(out, mask, labels, labels_cls):
        valid = mask & (labels != 0)  # drop table (engine :281-285)
        sims = out.astype(jnp.float32) @ cls_n.T.astype(jnp.float32)
        pred = jnp.argmax(sims, axis=-1)
        return intersection_and_union(pred, labels_cls, n_classes,
                                      ignore_index=ignore, valid_mask=valid)

    inter = np.zeros(n_classes)
    union = np.zeros(n_classes)
    target = np.zeros(n_classes)
    dlosses = []
    for batch in loader:
        out, dloss = forward(batch)
        dlosses.append(float(dloss))
        for s in range(out.shape[0]):
            i, u, t = seg_step(out[s], jnp.asarray(batch["mask"][s]),
                               jnp.asarray(batch["labels"][s]),
                               jnp.asarray(batch["labels_cls"][s]))
            inter += np.asarray(i)
            union += np.asarray(u)
            target += np.asarray(t)
    iou_class = inter / (union + 1e-10)
    acc_class = inter / (target + 1e-10)
    return {
        "mIoU": float(np.mean(iou_class)),
        "mAcc": float(np.mean(acc_class)),
        "allAcc": float(inter.sum() / (target.sum() + 1e-10)),
        "SimLoss": float(np.mean(dlosses)) if dlosses else 0.0,
    }
