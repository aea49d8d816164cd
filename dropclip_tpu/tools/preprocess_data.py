"""Offline ingest: raw multi-view scenes -> fused per-object features -> h5.

The reference's throughput-critical pipeline (reference
tools/preprocess_data.py:152-332 ``preprocess_blender_views``): aggregate
73 RGB-D views into a voxel cloud, run the CLIP teacher per (view, object)
with crop-mask visual prompts, build text-query embeddings, fuse
object-level features across views (visibility + relative-similarity
weights), replace never-seen objects' NaN rows with their text embedding,
and write the processed-scene h5. Idempotent per scene (existing outputs
are skipped, reference :192-199).

TPU-native: aggregation, prompting, CLIP forwards, and fusion are all
jitted device programs; the host only decodes files and writes h5.

Usage:
  python -m dropclip_tpu.tools.preprocess_data -ds Blender -r RAW_ROOT \
      -c OUT_DIR --split train --clip-checkpoint clip.pt [--start 0 --end 100]
  python -m dropclip_tpu.tools.preprocess_data -ds Synthetic -c OUT_DIR \
      --n-scenes 4      # tiny random-weights smoke pipeline, no data needed
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

import jax

from ..data.queries import prepare_fusion_queries
from ..data.scene_io import write_scene
from ..fusion.core import FusionConfig, fuse_obj_prior
from ..geom.aggregate import aggregate_views
from ..teachers.extractor import ClipExtractor

# jit at the tool level: one compiled program per static (shape, config)
_agg_jit = jax.jit(aggregate_views, static_argnames=(
    "voxel_size", "capacity", "num_labels", "depth_trunc", "bits"))
_fuse_jit = jax.jit(fuse_obj_prior, static_argnames=("cfg",))


def embed_fusion_queries(extractor: ClipExtractor, obj_info: Dict,
                         scenario: str = "open") -> jnp.ndarray:
    """{0: table, objects...} -> (Q, C) normalized mean-pooled embeddings
    (reference preprocess_data.py:252-265)."""
    queries = {0: ["table"],
               **prepare_fusion_queries(
                   {k: v for k, v in obj_info.items() if k > 0}, scenario)}
    # one batched text-encoder call for the whole scene (a call per
    # object costs seconds each through the host link)
    keys = sorted(queries)
    flat, spans = [], []
    for k in keys:
        spans.append((len(flat), len(queries[k])))
        flat.extend(queries[k])
    embs_flat = extractor.encode_text(flat)
    q = jnp.stack([jnp.mean(embs_flat[s: s + n], axis=0) for s, n in spans])
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def stage_scene(images: np.ndarray, depths: np.ndarray, segs: np.ndarray,
                poses: np.ndarray, K: np.ndarray) -> Dict:
    """Ship one scene's arrays host->device in the smallest wire dtypes.

    The host link is the ingest bottleneck (~25-55 MB/s through the
    tunnel): images go as uint8, depths as float16 (<=0.5 mm rounding at
    tabletop range — far under the 5 mm voxel), segs as uint8 (MV-TOD has
    <256 instances). ``jax.device_put`` is ASYNCHRONOUS: call this one
    scene AHEAD of ``process_scene`` and the transfer rides under the
    previous scene's compute (see run_blender / bench.py).
    """
    assert int(np.max(segs)) < 256, "seg ids must fit uint8"
    return dict(
        images=jax.device_put(np.asarray(images, np.uint8)),
        depths=jax.device_put(np.asarray(depths, np.float16)),
        segs=jax.device_put(np.asarray(segs, np.uint8)),
        poses=jax.device_put(np.asarray(poses, np.float32)),
        K=jax.device_put(np.asarray(K, np.float32)))


def process_scene(images: np.ndarray, depths: np.ndarray, segs: np.ndarray,
                  poses: np.ndarray, K: np.ndarray, obj_info: Dict,
                  extractor: ClipExtractor, out_path: str,
                  voxel_size: float, cloud_capacity: int = 65536,
                  max_objects: int = 32,
                  eval_scenario: str = "open", sim_kernel: str = "max",
                  use_visibility: bool = False, use_similarity: bool = True,
                  vis_threshold: float = 0.05, staged: Dict = None) -> Dict:
    """One scene end-to-end; returns timing/stat dict.

    Every device program runs at STATIC shapes — the cloud stays padded to
    ``cloud_capacity`` and objects/queries are padded to ``max_objects``
    (masked via fuse_obj_prior's obj_valid) — so scene 2..N reuse scene 1's
    compilations regardless of point/object counts.
    """
    t0 = time.time()
    n_real = max(int(k) for k in obj_info) + 1  # incl. table id 0
    assert n_real <= max_objects, (n_real, max_objects)
    h, w = depths.shape[1:]

    # ship every big array over the host link ONCE in the smallest wire
    # dtype (re-shipping per stage dominated ingest time); widen on device
    # so downstream jit signatures stay f32/int32. Callers that prefetch
    # pass ``staged`` so the transfer overlaps the PREVIOUS scene's compute.
    if staged is None:
        staged = stage_scene(images, depths, segs, poses, K)
    dev_depths = staged["depths"].astype(jnp.float32)
    dev_segs = staged["segs"].astype(jnp.int32)
    dev_images = staged["images"]
    dev_poses = staged["poses"]
    dev_K = staged["K"]

    # 1) aggregate views -> labeled voxel cloud (geometry.py:120-204)
    xyz, rgb, labels, mask = _agg_jit(
        dev_depths, dev_images, dev_segs, dev_poses, dev_K,
        voxel_size=voxel_size, capacity=cloud_capacity,
        num_labels=max_objects)
    keep = np.asarray(mask) & (np.asarray(labels) != 0)  # drop table+pad
    t_agg = time.time() - t0

    # 2) per-(view, object) teacher features with visual prompts
    t0 = time.time()
    obj_feats, present = extractor.extract_obj_prior(
        dev_images, dev_segs, obj_ids=np.arange(max_objects),
        present_hint=segs)
    t_clip = time.time() - t0

    # 3) text queries + object-level fusion (padded cloud + padded objects)
    t0 = time.time()
    q_real = embed_fusion_queries(extractor, obj_info, eval_scenario)
    feat_dim = q_real.shape[-1]
    query_embs = jnp.zeros((max_objects, feat_dim), jnp.float32
                           ).at[:n_real].set(q_real)
    obj_valid = jnp.arange(max_objects) < n_real
    cfg = FusionConfig(image_hw=(h, w), visibility_threshold=vis_threshold,
                       use_visibility=use_visibility,
                       use_similarity=use_similarity, sim_kernel=sim_kernel)
    fused = _fuse_jit(xyz, dev_depths, dev_segs, dev_poses, obj_feats,
                      present, query_embs, dev_K, cfg, obj_valid=obj_valid)
    obj_out = np.array(fused.obj_features[:n_real])
    # NaN objects (never fused) -> their text embedding (reference :277-282)
    nan_rows = np.any(np.isnan(obj_out), axis=-1)
    obj_out[nan_rows] = np.asarray(q_real)[nan_rows]

    # final host-side compaction: padded/table rows out, plus points
    # invisible in every view (reference fuse_obj_prior :278-283)
    sel = keep & np.asarray(fused.visible)
    vis_mask = np.asarray(fused.visibility)[:, sel]
    t_fuse = time.time() - t0

    write_scene(out_path, xyz=np.asarray(xyz)[sel], rgb=np.asarray(rgb)[sel],
                label=np.asarray(labels)[sel], vis_mask=vis_mask,
                obj_feats=obj_out, objects_info=obj_info)
    return {"points": int(sel.sum()), "objects": n_real,
            "nan_objects": int(nan_rows.sum()), "t_aggregate": t_agg,
            "t_teacher": t_clip, "t_fuse": t_fuse}


def build_extractor(args) -> ClipExtractor:
    from ..teachers.clip import build_clip

    model = build_clip(args.clip_model, dtype=jnp.bfloat16)
    if args.clip_checkpoint:
        from ..teachers.convert import load_params

        variables = {"params": load_params(args.clip_checkpoint)}
    else:
        import jax

        print("WARNING: no --clip-checkpoint; using RANDOM teacher weights "
              "(pipeline smoke mode)")
        px = jnp.zeros((1, 336, 448, 3), jnp.float32)
        toks = jnp.zeros((1, 77), jnp.int32)
        variables = jax.jit(lambda p, t: model.init(
            jax.random.PRNGKey(0), p, t))(px, toks)
    return ClipExtractor(model, variables, mode="cls",
                         visual_prompt=args.visual_prompt.split(","),
                         crop_num_levels=args.crop_num_levels,
                         crop_expansion_ratio=args.crop_expansion_ratio,
                         img_resize=(336, 448), batch_size=args.batch_size)


def run_blender(args) -> None:
    from ..data.blender import BlenderDataset

    dataset = BlenderDataset(args.root, models_root=args.models_root,
                             split=args.split)
    extractor = build_extractor(args)
    os.makedirs(args.out, exist_ok=True)
    end = args.end if args.end >= 0 else len(dataset.scene_ids) - 1
    # software pipeline: load + device-stage scene i while scene i-1
    # computes (device_put is async; the host link is the bottleneck)
    pending = None  # (scene_id, kwargs) staged but not yet processed
    for sid in range(args.start, end + 2):
        nxt = None
        if sid <= end:
            scene_id = f"{sid:06d}"
            out_path = os.path.join(args.out, args.split, scene_id,
                                    f"{scene_id}.h5py")
            if os.path.isfile(out_path):
                print(f"skip {scene_id}: exists")
            elif scene_id in dataset.scene_ids:
                scene = dataset[sid]
                segs, _ = BlenderDataset.obtain_seg_info(scene)
                views = list(scene["views"].values())
                kw = dict(
                    images=np.stack([v["rgb"] for v in views]),
                    depths=np.stack([v["depth"] for v in views]),
                    segs=np.stack(segs),
                    poses=np.stack([np.asarray(v["camera"]["world_matrix"],
                                               np.float32) for v in views]),
                    K=_intrinsic_matrix(scene["camera_intrinsic"]),
                    obj_info=scene["objects_info"], out_path=out_path,
                    voxel_size=args.voxel_size * scene["world_scale"])
                kw["staged"] = stage_scene(kw["images"], kw["depths"],
                                           kw["segs"], kw["poses"], kw["K"])
                nxt = (scene_id, kw)
        if pending is not None:
            scene_id, kw = pending
            stats = process_scene(extractor=extractor, **kw)
            print(f"{scene_id}: {stats}")
        pending = nxt


def run_synthetic(args) -> None:
    """Full-pipeline smoke run on procedurally generated raw scenes."""
    from ..data.synthetic import make_raw_scene

    extractor = build_extractor(args)
    rng = np.random.default_rng(0)
    for sid in range(args.n_scenes):
        scene_id = f"{sid:06d}"
        out_path = os.path.join(args.out, args.split, scene_id,
                                f"{scene_id}.h5py")
        raw = make_raw_scene(rng, n_objects=3, n_views=args.n_views)
        info = {k: (v if k > 0 else "table")
                for k, v in raw["objects_info"].items()}
        stats = process_scene(
            images=raw["images"], depths=raw["depths"], segs=raw["segs"],
            poses=raw["poses"], K=raw["K"], obj_info=raw["objects_info"],
            extractor=extractor, out_path=out_path,
            voxel_size=args.voxel_size, cloud_capacity=4096)
        print(f"{scene_id}: {stats}")


def _intrinsic_matrix(ci: Dict) -> np.ndarray:
    return np.array([[ci["fx"], 0, ci["cx"]], [0, ci["fy"], ci["cy"]],
                     [0, 0, 1]], np.float32)


def main() -> None:
    p = argparse.ArgumentParser("dropclip_tpu offline ingest")
    p.add_argument("-ds", "--dataset", choices=["Blender", "Synthetic"],
                   required=True)
    p.add_argument("-r", "--root", default=None, help="raw dataset root")
    p.add_argument("-c", "--out", required=True, help="processed output dir")
    p.add_argument("--models-root", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--voxel-size", type=float, default=0.02)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--clip-model", default="ViT-L/14@336px")
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--visual-prompt", default="crop-mask")
    p.add_argument("--crop-num-levels", type=int, default=1)
    p.add_argument("--crop-expansion-ratio", type=float, default=0.15)
    p.add_argument("--n-scenes", type=int, default=4, help="synthetic only")
    p.add_argument("--n-views", type=int, default=4, help="synthetic only")
    args = p.parse_args()
    if args.dataset == "Blender":
        assert args.root, "-r/--root required for Blender"
        run_blender(args)
    else:
        run_synthetic(args)


if __name__ == "__main__":
    main()
