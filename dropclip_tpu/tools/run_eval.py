"""Fusion-quality ablation driver — grounding metrics straight from the
fusion stage, no student involved.

Counterpart of reference scripts/run_eval.py:103-329: per raw scene,
aggregate the cloud, extract teacher features (object-prior cls mode or
dense patch mode), fuse (object-level or point-level) with every design
axis exposed as a flag — #views, visibility, similarity kernel, visual
prompt, negatives, method, threshold — then ground each eval query and
report mIoU / Pr@{25,50,75}. Drives the same ablation grid as the
reference's scripts/RUN_*.bash sweeps.

Usage:
  python -m dropclip_tpu.tools.run_eval -ds Synthetic --clip-model tiny-test \
      --use_obj_prior 1 --use_similarity 1 --use_sim_kernel max ...
  python -m dropclip_tpu.tools.run_eval -ds Blender -r RAW_ROOT \
      --clip-checkpoint clip.pt --n_views 9 ...
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import grounding_metrics
from ..data.queries import prepare_queries
from ..fusion.core import (FusionConfig, fuse_obj_prior, fuse_points,
                           splat_object_features)
from ..geom.aggregate import aggregate_views
from ..similarity import (NEGATIVE_PROMPT_GENERIC, l2_normalize,
                          predict_from_embeddings)
from .preprocess_data import build_extractor, embed_fusion_queries

_agg_jit = jax.jit(aggregate_views, static_argnames=(
    "voxel_size", "capacity", "num_labels", "depth_trunc", "bits"))
_fuse_obj_jit = jax.jit(fuse_obj_prior, static_argnames=("cfg",))
_fuse_pts_jit = jax.jit(fuse_points, static_argnames=("cfg",))


def _dump_query_viz(viz_dir: str, scene_id: str, obj_id: int, text: str,
                    xyz, rgb, sel, pred, sims, gt) -> None:
    """Heatmap | gt | thresholded-prediction panels per query (the
    reference's viz_clip_pred_gt debug hook, scripts/run_eval.py:28-41,
    as a .pcd dump). ``obj_id`` keys the filename so two instances of
    the same class (identical query text) don't overwrite each other."""
    import re

    from ..viz import export_clip_pred

    p = np.asarray(xyz)[sel]
    if p.size == 0:  # no visible points survived the masks for this query
        return
    s = np.asarray(sims, np.float32)[sel]
    rng = s.max() - s.min()
    slug = re.sub(r"[^a-z0-9]+", "_", text.lower())[:40]
    export_clip_pred(
        os.path.join(viz_dir, f"{scene_id}_o{obj_id}_{slug}.pcd"), p,
        np.asarray(pred, bool)[sel],
        (s - s.min()) / (rng if rng > 0 else 1.0),
        background=np.clip(np.asarray(rgb)[sel], 0, 1),
        gt=np.asarray(gt, np.float32)[sel],
        trans_factor=float(np.ptp(p[:, 0]) * 1.2 + 1e-3) if len(p) else 1.0)


def _teacher_cache(args, scene_id: str, mode: str, names, compute):
    """chp_folder-style teacher-output cache (reference scripts/
    run_eval.py:165-227 caches per-scene clip features to disk): ablation
    sweeps over fusion/grounding axes (sim kernel, negatives, thresholds)
    reuse the expensive extraction across runs. Keyed by the args that
    change the teacher outputs; atomic tmp+rename writes."""
    cache = getattr(args, "cache_dir", None)
    if not cache:
        return compute()
    import hashlib

    # dataset/root/split belong in the key: scene ids collide across
    # datasets ('0000' is both a Synthetic and a Blender id)
    key = "|".join(str(getattr(args, k, None)) for k in (
        "dataset", "root", "split",
        "clip_model", "clip_checkpoint", "visual_prompt",
        "crop_num_levels", "crop_expansion_ratio", "n_views",
        "max_objects"))
    digest = hashlib.md5(key.encode()).hexdigest()[:10]
    path = os.path.join(cache, f"{scene_id}_{mode}_{digest}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return tuple(z[n] for n in names)
    def _np32(x):
        a = np.asarray(x)
        # npz has no bf16; the fusion path consumes f32 anyway
        return a.astype(np.float32) if a.dtype == jnp.bfloat16 else a

    out = tuple(_np32(x) for x in compute())
    os.makedirs(cache, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}.npz"
    np.savez(tmp, **dict(zip(names, out)))
    os.replace(tmp, path)
    return out


def eval_scene(raw: Dict, extractor, args) -> Dict[str, float]:
    """One scene: aggregate -> extract -> fuse -> ground queries -> metrics."""
    images, depths, segs = raw["images"], raw["depths"], raw["segs"]
    poses, K = raw["poses"], raw["K"]
    obj_info = raw["objects_info"]
    if args.n_views > 0:
        step = max(1, len(images) // args.n_views)
        sel = slice(0, args.n_views * step, step)
        images, depths, segs, poses = (images[sel], depths[sel], segs[sel],
                                       poses[sel])
    h, w = depths.shape[1:]
    n_real = max(int(k) for k in obj_info) + 1
    q_max = args.max_objects
    assert n_real <= q_max

    xyz, rgb, labels, mask, agg_dropped = _agg_jit(
        jnp.asarray(depths), jnp.asarray(images, jnp.float32) / 255.0,
        jnp.asarray(segs), jnp.asarray(poses), jnp.asarray(K),
        voxel_size=args.voxel_size, capacity=args.cloud_capacity,
        num_labels=q_max)
    if int(agg_dropped):
        print(f"WARNING: {int(agg_dropped)} points truncated during "
              "aggregation (raise cloud_capacity)", flush=True)
    keep = np.asarray(mask) & (np.asarray(labels) != 0)

    q_real = embed_fusion_queries(extractor, obj_info, args.kernel_queries)
    query_embs = jnp.zeros((q_max, q_real.shape[-1]), jnp.float32
                           ).at[:n_real].set(q_real)
    obj_valid = jnp.arange(q_max) < n_real
    cfg = FusionConfig(image_hw=(h, w), use_visibility=bool(args.use_visibility),
                       use_similarity=bool(args.use_similarity),
                       sim_kernel=args.use_sim_kernel)

    scene_id = str(raw.get("scene_id", "s"))
    if args.use_obj_prior:
        def _obj_prior():
            extractor.set_mode("cls")
            return extractor.extract_obj_prior(images, segs,
                                               obj_ids=np.arange(q_max))

        obj_feats, present = _teacher_cache(
            args, scene_id, "objprior", ("obj_feats", "present"), _obj_prior)
        obj_feats, present = jnp.asarray(obj_feats), jnp.asarray(present)
        fused = _fuse_obj_jit(xyz, jnp.asarray(depths), jnp.asarray(segs),
                              jnp.asarray(poses), obj_feats, present,
                              query_embs, jnp.asarray(K), cfg,
                              obj_valid=obj_valid)
        obj_out = np.array(fused.obj_features)
        nan_rows = np.any(np.isnan(obj_out), axis=-1)
        obj_out[nan_rows] = np.asarray(query_embs)[nan_rows]
        point_feats = splat_object_features(labels, jnp.asarray(obj_out))
        visible = np.asarray(fused.visible)
    else:
        def _patches():
            extractor.set_mode("patch")
            return (extractor.extract(images),)  # (V, ph, pw, C)

        (patch_feats,) = _teacher_cache(
            args, scene_id, "patch", ("patch_feats",), _patches)
        patch_feats = jnp.asarray(patch_feats)
        fused = _fuse_pts_jit(xyz, jnp.asarray(depths), jnp.asarray(segs),
                              jnp.asarray(poses), patch_feats, query_embs,
                              jnp.asarray(K), cfg)
        point_feats = jnp.nan_to_num(fused.features)
        visible = np.asarray(fused.visible)

    sel_pts = jnp.asarray(keep & visible)
    labels_np = np.asarray(labels)

    # ground each eval-scenario query
    queries = prepare_queries(
        {k: v for k, v in obj_info.items() if isinstance(v, dict)},
        args.eval_scenario)
    preds, gts = [], []
    for obj_id, texts in queries.items():
        for text in texts:
            if args.sim_negatives == "generic":
                negs = extractor.encode_text(NEGATIVE_PROMPT_GENERIC)
            elif args.sim_negatives == "scene":
                others = [t for k2, v2 in queries.items() if k2 != obj_id
                          for t in v2]
                negs = (extractor.encode_text(others) if others else
                        extractor.encode_text(NEGATIVE_PROMPT_GENERIC))
            elif args.sim_negatives == "all":
                # every dataset class name except this object's class (and
                # the table) — reference scripts/run_eval.py:262-263
                cls = str(obj_info[obj_id].get("cls_name", ""))
                others = [c for c in args._cls_list if c not in (cls, "table")]
                negs = (extractor.encode_text(others) if others else
                        extractor.encode_text(NEGATIVE_PROMPT_GENERIC))
            elif args.sim_negatives == "none":
                negs = None
            else:
                raise ValueError(args.sim_negatives)
            pos = l2_normalize(extractor.encode_text([text])[0])
            negs = l2_normalize(negs) if negs is not None else None
            pred, sims = predict_from_embeddings(
                point_feats, pos, negs, mask=sel_pts,
                method=args.sim_method, threshold=args.sim_thr)
            preds.append(np.asarray(pred))
            gts.append((labels_np == obj_id) & np.asarray(sel_pts))
            if getattr(args, "viz_dir", None):
                _dump_query_viz(args.viz_dir, str(raw.get("scene_id", "s")),
                                int(obj_id), text, xyz, rgb,
                                np.asarray(sel_pts),
                                preds[-1], np.asarray(sims), gts[-1])
    if not preds:
        return {}
    miou, prs = grounding_metrics(jnp.asarray(np.stack(preds), jnp.float32),
                                  jnp.asarray(np.stack(gts)))
    return {"mIoU": float(miou), "Pr@25": float(prs[0]),
            "Pr@50": float(prs[1]), "Pr@75": float(prs[2]),
            "n_queries": len(preds)}


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu fusion ablation eval")
    p.add_argument("-ds", "--dataset", choices=["Blender", "Synthetic"],
                   default="Synthetic")
    p.add_argument("-r", "--root", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--models-root", default=None)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--n-scenes", type=int, default=3, help="synthetic only")
    p.add_argument("--n_views", type=int, default=-1, help="-1 = all views")
    p.add_argument("--use_obj_prior", type=int, default=1)
    p.add_argument("--use_visibility", type=int, default=0)
    p.add_argument("--use_similarity", type=int, default=1)
    p.add_argument("--use_sim_kernel", choices=["max", "mean"], default="max")
    p.add_argument("--kernel_queries", default="cls",
                   help="fusion-kernel query scenario (cls|cls+attr|open)")
    p.add_argument("--eval_scenario", default="cls")
    p.add_argument("--sim_method", choices=["paired", "argmax"],
                   default="paired")
    p.add_argument("--sim_negatives",
                   choices=["generic", "scene", "none", "all"],
                   default="generic")
    p.add_argument("--sim_thr", type=float, default=0.75)
    p.add_argument("--voxel_size", type=float, default=0.01)
    p.add_argument("--cloud_capacity", type=int, default=65536)
    p.add_argument("--max_objects", type=int, default=32)
    p.add_argument("--visual-prompt", default="crop-mask")
    p.add_argument("--crop-num-levels", type=int, default=1)
    p.add_argument("--crop-expansion-ratio", type=float, default=0.15)
    p.add_argument("--clip-model", default="ViT-L/14@336px")
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--save-results", default=None)
    p.add_argument("--viz-dir", default=None, help="dump per-query heatmap|gt|pred .pcd panels (reference viz_clip_pred_gt)")
    p.add_argument("--cache-dir", default=None, dest="cache_dir",
                   help="per-scene teacher-feature cache shared across "
                        "ablation runs (reference chp_folder)")
    args = p.parse_args()

    extractor = build_extractor(args)
    scenes: List[Dict] = []
    if args.dataset == "Synthetic":
        from ..data.synthetic import make_raw_scene

        rng = np.random.default_rng(0)
        args.cloud_capacity = min(args.cloud_capacity, 4096)
        scenes = [make_raw_scene(rng, n_objects=3, n_views=4)
                  for _ in range(args.n_scenes)]
    else:
        from ..data.blender import BlenderDataset

        ds = BlenderDataset(args.root, models_root=args.models_root,
                            split=args.split)
        end = args.end if args.end >= 0 else len(ds.scene_ids) - 1
        for sid in range(args.start, end + 1):
            scene = ds[sid]
            segs, _ = BlenderDataset.obtain_seg_info(scene)
            views = list(scene["views"].values())
            scenes.append({
                # real id, not loop index: keeps --cache-dir entries
                # stable across --start/--end windows
                "scene_id": str(ds.scene_ids[sid]),
                "images": np.stack([v["rgb"] for v in views]),
                "depths": np.stack([v["depth"] for v in views]),
                "segs": np.stack(segs),
                "poses": np.stack([np.asarray(v["camera"]["world_matrix"],
                                              np.float32) for v in views]),
                "K": np.array([[scene["camera_intrinsic"]["fx"], 0,
                                scene["camera_intrinsic"]["cx"]],
                               [0, scene["camera_intrinsic"]["fy"],
                                scene["camera_intrinsic"]["cy"]],
                               [0, 0, 1]], np.float32),
                "objects_info": scene["objects_info"],
            })

    # dataset-wide class vocabulary for --sim_negatives all (reference
    # run_eval.py:263 uses dataset.id_to_name): Blender has a fixed label
    # map; for Synthetic the generated scenes ARE the dataset.
    if args.dataset == "Blender":
        args._cls_list = sorted({str(n) for n in ds.id_to_name.values()})
    else:
        args._cls_list = sorted({
            str(v["cls_name"]) for s in scenes
            for v in s["objects_info"].values()
            if isinstance(v, dict) and "cls_name" in v})

    results = []
    for i, raw in enumerate(scenes):
        raw.setdefault("scene_id", f"{i:04d}")
        t0 = time.time()
        res = eval_scene(raw, extractor, args)
        print(f"scene {i}: {res} ({time.time()-t0:.1f}s)")
        if res:
            results.append(res)

    agg = {k: float(np.mean([r[k] for r in results]))
           for k in ("mIoU", "Pr@25", "Pr@50", "Pr@75")} if results else {}
    summary = {"config": {k: v for k, v in vars(args).items()
                          if not k.startswith("_")}, "mean": agg,
               "n_scenes": len(results)}
    print(json.dumps({"mean": agg, "n_scenes": len(results)}))
    if args.save_results:
        with open(args.save_results, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
