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


def _fusion_query_texts(obj_info: Dict, scenario: str) -> Dict:
    """{0: table, objects...} per-object query texts (reference
    preprocess_data.py:252-256)."""
    return {0: ["table"],
            **prepare_fusion_queries(
                {k: v for k, v in obj_info.items() if k > 0}, scenario)}


def embed_fusion_queries(extractor: ClipExtractor, obj_info: Dict,
                         scenario: str = "open") -> jnp.ndarray:
    """{0: table, objects...} -> (Q, C) normalized mean-pooled embeddings
    (reference preprocess_data.py:252-265). Compacts to the real object
    rows; the ingest hot path uses the padded extractor.encode_queries
    directly (one jit dispatch per scene).

    n_segments is jit-STATIC, so it is padded to a power-of-two bucket
    (min 8) and sliced back: per-scene object counts otherwise recompile
    the whole text tower for every distinct count."""
    queries = _fusion_query_texts(obj_info, scenario)
    n = max(queries) + 1
    n_pad = max(8, 1 << (n - 1).bit_length())
    return extractor.encode_queries(queries, n_segments=n_pad)[:n]


class SceneWriter:
    """One-slot async h5 writer.

    The previous scene's write overlaps the current scene's device
    compute, but the slot is bounded to a SINGLE pending write: a disk
    slower than compute backpressures ingest instead of accumulating
    tens-of-MB scene payloads in memory, and a failed write re-raises on
    the next ``submit``/``close`` instead of being silently dropped on an
    unobserved future (a scene would otherwise be reported processed with
    no file on disk)."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(1)
        self._fut = None
        self._tag = None
        #: (tag, return value) per completed submit — programmatic callers
        #: of the async path read truncation/NaN stats here instead of
        #: scraping the writer thread's log lines (ADVICE r3)
        self.results = []

    def _join(self):
        if self._fut is None:
            return
        fut, tag = self._fut, self._tag
        self._fut = self._tag = None
        try:
            self.results.append((tag, fut.result()))
        except Exception as e:
            # name the scene that FAILED: the join happens on the next
            # scene's submit, which would otherwise take the blame
            raise RuntimeError(
                f"async scene finalize failed for {tag!r}") from e

    def submit(self, fn, *args, tag=None, **kwargs):
        self._join()  # join + re-raise the previous write
        self._tag = tag
        self._fut = self._pool.submit(fn, *args, **kwargs)

    def close(self):
        try:
            self._join()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def stage_scene(images: np.ndarray, depths: np.ndarray, segs: np.ndarray,
                poses: np.ndarray, K: np.ndarray, device=None) -> Dict:
    """Ship one scene's arrays host->device in the smallest wire dtypes.

    The host link is the ingest bottleneck (~25-55 MB/s through the
    tunnel): images go as uint8, depths as float16 (<=0.5 mm rounding at
    tabletop range — far under the 5 mm voxel), segs as uint8 (MV-TOD has
    <256 instances). ``jax.device_put`` is ASYNCHRONOUS: call this one
    scene AHEAD of ``process_scene`` and the transfer rides under the
    previous scene's compute (see run_blender / bench.py).

    ``device`` pins the scene to a specific chip (multi-device ingest:
    every downstream jit follows its committed inputs, so one staged
    scene keeps a whole scene's pipeline on its device).
    """
    assert int(np.max(segs)) < 256, "seg ids must fit uint8"
    put = lambda x: jax.device_put(x, device)
    return dict(
        images=put(np.asarray(images, np.uint8)),
        depths=put(np.asarray(depths, np.float16)),
        segs=put(np.asarray(segs, np.uint8)),
        poses=put(np.asarray(poses, np.float32)),
        K=put(np.asarray(K, np.float32)))


def process_scene(images: np.ndarray, depths: np.ndarray, segs: np.ndarray,
                  poses: np.ndarray, K: np.ndarray, obj_info: Dict,
                  extractor: ClipExtractor, out_path: str,
                  voxel_size: float, cloud_capacity: int = 65536,
                  max_objects: int = 32,
                  eval_scenario: str = "open", sim_kernel: str = "max",
                  use_visibility: bool = False, use_similarity: bool = True,
                  vis_threshold: float = 0.05, staged: Dict = None,
                  writer=None, sync_timings: bool = False) -> Dict:
    """One scene end-to-end; returns timing/stat dict.

    Every device program runs at STATIC shapes — the cloud stays padded to
    ``cloud_capacity`` and objects/queries are padded to ``max_objects``
    (masked via fuse_obj_prior's obj_valid) — so scene 2..N reuse scene 1's
    compilations regardless of point/object counts.

    ``sync_timings`` fetches a scalar at the teacher phase boundary so the
    returned t_teacher/t_fuse split is a real device-time split instead of
    dispatch-vs-fetch accounting (the tunneled runtime acks
    block_until_ready early, so the sync is a host fetch). Costs a little
    pipeline overlap — bench-only; production ingest leaves it off.
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

    # 1) aggregate views -> labeled voxel cloud (geometry.py:120-204).
    # Label-vote width bucketed to 16/32: the downsample's wide-row
    # scatter payload is (7 + num_labels) floats per point over 22M
    # points, and typical MV-TOD scenes have ~11 objects — the 16 bucket
    # cuts ~40% of the scatter traffic (2 static compile buckets).
    num_labels = 16 if n_real <= 16 else max_objects
    xyz, rgb, labels, mask, agg_dropped = _agg_jit(
        dev_depths, dev_images, dev_segs, dev_poses, dev_K,
        voxel_size=voxel_size, capacity=cloud_capacity,
        num_labels=num_labels)
    if sync_timings:  # scalar fetch = the only reliable sync (see doc)
        np.asarray(agg_dropped)
    t_agg = time.time() - t0

    # 2) per-(view, object) teacher features with visual prompts
    t0 = time.time()
    obj_feats, present = extractor.extract_obj_prior(
        dev_images, dev_segs, obj_ids=np.arange(max_objects),
        present_hint=segs)
    if sync_timings:
        np.asarray(obj_feats[0, 0, :1])
    t_clip = time.time() - t0

    # 3) text queries + object-level fusion (padded cloud + padded objects).
    # Everything up to the final fetches stays on device with NO host
    # sync in between: agg -> teacher -> queries -> fuse queue as one
    # device pipeline (each mid-phase fetch costs a host-link round trip,
    # and GIL-held eager ops serialize the multi-device ingest workers).
    t0 = time.time()
    query_embs = extractor.encode_queries(
        _fusion_query_texts(obj_info, eval_scenario), n_segments=max_objects)
    obj_valid = np.arange(max_objects) < n_real
    cfg = FusionConfig(image_hw=(h, w), visibility_threshold=vis_threshold,
                       use_visibility=use_visibility,
                       use_similarity=use_similarity, sim_kernel=sim_kernel)
    fused = _fuse_jit(xyz, dev_depths, dev_segs, dev_poses, obj_feats,
                      present, query_embs, dev_K, cfg, obj_valid=obj_valid)
    if sync_timings:  # sync the FUSE phase only; the finalize tail
        np.asarray(fused.obj_features[:1, :1])  # (fetch+write) is timed
    t_fuse = time.time() - t0  # separately as t_finalize below

    def _finalize() -> Dict:
        # device->host fetches (~15 MB over the host link) + compaction +
        # h5 write — the whole post-dispatch tail
        if int(agg_dropped):
            print(f"WARNING: {int(agg_dropped)} points truncated during "
                  f"aggregation (cloud_capacity={cloud_capacity} or grid "
                  f"extent too small) -> {out_path}", flush=True)
        keep = np.asarray(mask) & (np.asarray(labels) != 0)  # table+pad out
        obj_out = np.array(np.asarray(fused.obj_features)[:n_real])
        # NaN objects (never fused) -> their text embedding (ref :277-282)
        nan_rows = np.any(np.isnan(obj_out), axis=-1)
        obj_out[nan_rows] = np.asarray(query_embs)[:n_real][nan_rows]
        # final host-side compaction: padded/table rows out, plus points
        # invisible in every view (reference fuse_obj_prior :278-283)
        sel = keep & np.asarray(fused.visible)
        vis_mask = np.asarray(fused.visibility)[:, sel]
        write_scene(out_path, xyz=np.asarray(xyz)[sel],
                    rgb=np.asarray(rgb)[sel], label=np.asarray(labels)[sel],
                    vis_mask=vis_mask, obj_feats=obj_out,
                    objects_info=obj_info)
        stats = {"points": int(sel.sum()), "objects": n_real,
                 "nan_objects": int(nan_rows.sum())}
        if stats["points"] == 0:
            print(f"WARNING: 0 points survived compaction -> {out_path} "
                  f"(all points table/pad or invisible in every view)",
                  flush=True)
        return stats

    timings = {"t_aggregate": t_agg, "t_teacher": t_clip, "t_fuse": t_fuse}
    if writer is not None and not sync_timings:
        # async tail: the writer thread pulls THIS scene's outputs over
        # the host link and writes the h5 while the main thread dispatches
        # the NEXT scene — the fetch (~0.5 s of ~30 MB/s tunnel link) and
        # write leave the critical path entirely. One-slot SceneWriter
        # semantics keep the backpressure: a slow disk/link stalls the
        # NEXT submit, never accumulates unbounded scene payloads.
        def _finalize_logged() -> Dict:
            # the quality stats (points / objects / nan_objects) must stay
            # visible in the production async path too: a systematically
            # broken teacher or fusion run surfaces as nan_objects, not as
            # an exception; the return value also lands in writer.results
            # for programmatic callers (ADVICE r3)
            stats = _finalize()
            print(f"{out_path}: {stats}", flush=True)
            return stats

        writer.submit(_finalize_logged, tag=out_path)
        return timings
    t0 = time.time()
    stats = _finalize()
    timings["t_finalize"] = time.time() - t0
    return {**stats, **timings}


def build_extractor(args) -> ClipExtractor:
    from ..teachers.clip import build_clip

    from ..teachers.convert import build_clip_variables

    model = build_clip(args.clip_model, dtype=jnp.bfloat16)
    variables = build_clip_variables(model, args.clip_checkpoint,
                                     context="--clip-checkpoint")
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
    # --end is EXCLUSIVE (half-open [start, end) — same contract as
    # run_regrad and scripts/RUN_preprocess_parallel.sh's chunking)
    end = args.end if args.end >= 0 else len(dataset.scene_ids)
    # software pipeline, both directions: a loader THREAD decodes + stages
    # scene i+1 (73x EXR/png decode is seconds of pure host CPU; device_put
    # is async) and a writer THREAD flushes scene i-1's h5 — both overlap
    # scene i's device compute instead of serializing with it
    from concurrent.futures import ThreadPoolExecutor

    def load_one(sid: int, device=None):
        scene_id = f"{sid:06d}"
        out_path = os.path.join(args.out, args.split, scene_id,
                                f"{scene_id}.h5py")
        if os.path.isfile(out_path):
            print(f"skip {scene_id}: exists")
            return None
        if scene_id not in dataset.scene_ids:
            return None
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
                                   kw["segs"], kw["poses"], kw["K"],
                                   device=device)
        return (scene_id, kw)

    if getattr(args, "n_devices", 1) > 1:
        _run_multidevice(extractor, load_one, range(args.start, end),
                         args.n_devices)
        return

    with ThreadPoolExecutor(1) as loader, SceneWriter() as writer:
        pending = None  # realized (scene_id, kwargs), staged, ready to run
        nxt_fut = None
        for sid in range(args.start, end + 1):
            nxt_fut = loader.submit(load_one, sid) if sid < end else None
            if pending is not None:
                scene_id, kw = pending
                stats = process_scene(extractor=extractor, writer=writer,
                                      **kw)
                print(f"{scene_id}: {stats}", flush=True)
            pending = nxt_fut.result() if nxt_fut is not None else None
        # exiting the with-blocks joins the last h5 write


def _run_multidevice(extractor: ClipExtractor, load_one, sids,
                     n_devices: int) -> None:
    """Single-host multi-chip ingest: scenes round-robin over local devices.

    The reference parallelizes ingest with a spawn Pool of CUDA processes
    (preprocess_data.py:728-730); TPU-native, one process owns every local
    chip, so parallelism is D worker THREADS, each pinned to one device
    via its staged inputs + a parameter replica (``ClipExtractor.
    on_device``). Scenes are independent — no collectives — and one
    worker's host work (decode, h5 write, result fetch) overlaps the
    other workers' device compute. Throughput scales ~linearly with
    chips (scene times are device-bound, PERF.md).
    """
    from concurrent.futures import ThreadPoolExecutor

    devices = jax.local_devices()
    nd = min(n_devices, len(devices))
    if nd < n_devices:
        print(f"WARNING: --n-devices {n_devices} > {len(devices)} local "
              f"devices; using {nd}", flush=True)
    replicas = [extractor.on_device(d) for d in devices[:nd]]
    sids = list(sids)

    def worker(wi: int) -> None:
        my = sids[wi::nd]
        # per-worker single-slot prefetch: scene i+1's decode + H2D
        # staging overlaps scene i's device compute (the sequential path
        # has the same structure; without it each worker's host load
        # serializes with its own device work AND, via the GIL, with
        # every other worker's host load)
        with SceneWriter() as writer, ThreadPoolExecutor(1) as loader:
            fut = (loader.submit(load_one, my[0], devices[wi])
                   if my else None)
            for j, _ in enumerate(my):
                loaded = fut.result()
                fut = (loader.submit(load_one, my[j + 1], devices[wi])
                       if j + 1 < len(my) else None)
                if loaded is None:
                    continue
                scene_id, kw = loaded
                stats = process_scene(extractor=replicas[wi], writer=writer,
                                      **kw)
                print(f"{scene_id} [dev{wi}]: {stats}", flush=True)

    with ThreadPoolExecutor(nd) as pool:
        futs = [pool.submit(worker, wi) for wi in range(nd)]
        for f in futs:
            f.result()  # re-raise worker failures


def run_synthetic(args) -> None:
    """Full-pipeline smoke run on procedurally generated raw scenes."""
    from ..data.synthetic import make_raw_scene

    extractor = build_extractor(args)

    def load_one(sid: int, device=None):
        scene_id = f"{sid:06d}"
        out_path = os.path.join(args.out, args.split, scene_id,
                                f"{scene_id}.h5py")
        # per-scene rng: identical scenes regardless of worker interleaving
        raw = make_raw_scene(np.random.default_rng(sid), n_objects=3,
                             n_views=args.n_views)
        kw = dict(images=raw["images"], depths=raw["depths"],
                  segs=raw["segs"], poses=raw["poses"], K=raw["K"],
                  obj_info=raw["objects_info"], out_path=out_path,
                  voxel_size=args.voxel_size, cloud_capacity=4096)
        if device is not None:
            kw["staged"] = stage_scene(kw["images"], kw["depths"],
                                       kw["segs"], kw["poses"], kw["K"],
                                       device=device)
        return (scene_id, kw)

    if getattr(args, "n_devices", 1) > 1:
        _run_multidevice(extractor, load_one, range(args.n_scenes),
                         args.n_devices)
        return
    for sid in range(args.n_scenes):
        scene_id, kw = load_one(sid)
        stats = process_scene(extractor=extractor, **kw)
        print(f"{scene_id}: {stats}")


def _intrinsic_matrix(ci: Dict) -> np.ndarray:
    return np.array([[ci["fx"], 0, ci["cx"]], [0, ci["fy"], ci["cy"]],
                     [0, 0, 1]], np.float32)


def process_regrad_scene(scene: Dict, camera_poses: Dict, K: np.ndarray,
                         extractor: ClipExtractor, out_path: str,
                         voxel_size: float, max_objects: int = 32) -> Dict:
    """One REGRAD scene: per-view 2D/3D consistency cleanup, patch-CLIP
    pixel fusion, per-object obj-prior fusion, processed-h5 write
    (reference tools/preprocess_data.py:431-607 + projections.py:151-241;
    h5 schema of save_multiview_dataset_h5py :40-58).

    Cleanup (reference :476-546): drop 3D points whose projection lands
    outside their object's 2D mask. Patch fusion: per-view ViT patch
    features sampled at each point's pixel (NN grid, the reference's
    reconstruct_feature_map path), voxel-mean over views. Object fusion:
    per-object mean of per-view obj-prior features over the views where
    the object is present (reference :233-235 means over all views; zero
    rows from absent views are excluded here — deviation, strictly more
    signal).
    """
    from ..geom.transforms import transform_pointcloud_to_camera_frame

    t0 = time.time()
    h = w = None
    imgs, segs, pcs, rgbs, labs, pixs = [], [], [], [], [], []
    for v, e in sorted(scene["views"].items()):
        if not e.get("valid"):
            continue
        img, seg = e["image"], e["segm2d"]
        xyz, rgb, lab = e["pc_xyz"], e["pc_rgb"], e["pc_label"]
        h, w = img.shape[:2]
        cam = np.array(transform_pointcloud_to_camera_frame(
            jnp.asarray(xyz, jnp.float32),
            jnp.asarray(camera_poses[v], jnp.float32)))
        # REGRAD implicit camera frame flip (reference projections.py:89-92)
        cam[:, 1] *= -1
        cam[:, 2] *= -1
        uvw = cam @ K.T
        z = np.where(np.abs(uvw[:, 2]) < 1e-9, 1e-9, uvw[:, 2])
        uv = (uvw[:, :2] / z[:, None])
        ys = np.clip(uv[:, 1].astype(int), 0, h - 1)
        xs = np.clip(uv[:, 0].astype(int), 0, w - 1)
        keep = np.zeros(len(xyz), bool)
        for obj in np.unique(seg)[1:] if seg.min() == 0 else np.unique(seg):
            m3 = lab == obj
            keep[m3] = seg[ys[m3], xs[m3]] == obj
        if not keep.any():
            continue
        imgs.append(img)
        segs.append(seg)
        pcs.append(xyz[keep])
        rgbs.append(rgb[keep])
        labs.append(lab[keep])
        pixs.append((ys[keep], xs[keep]))
    if not pcs:
        return {"points": 0, "skipped": True}
    t_clean = time.time() - t0

    # per-view dense patch features, sampled at each kept point's pixel
    t0 = time.time()
    extractor.set_mode("patch")
    patch = np.asarray(extractor.extract(np.stack(imgs)))  # (V, ph, pw, C)
    ph, pw = patch.shape[1:3]
    feats = []
    for i in range(len(pcs)):
        ys, xs = pixs[i]
        f = patch[i, (ys * ph // h), (xs * pw // w)]
        feats.append(f / np.maximum(
            np.linalg.norm(f, axis=-1, keepdims=True), 1e-6))

    # per-(view, object) obj-prior features
    obj_ids = np.unique(np.concatenate(labs)).astype(np.int32)
    assert len(obj_ids) <= max_objects, (len(obj_ids), max_objects)
    extractor.set_mode("cls")
    obj_feats, present = extractor.extract_obj_prior(
        jnp.asarray(np.stack(imgs)),
        jnp.asarray(np.stack(segs).astype(np.int32)),
        obj_ids=obj_ids, present_hint=np.stack(segs))
    obj_feats = np.asarray(obj_feats)  # (V, K, C)
    present = np.asarray(present)
    denom = np.maximum(present.sum(axis=0), 1)[:, None]
    per_obj = (obj_feats * present[..., None]).sum(axis=0) / denom
    t_teacher = time.time() - t0

    # aggregate + voxel pool (the shared host voxelizer)
    from ..geom.cleanup import voxel_pool

    t0 = time.time()
    xyz_v, pooled, lab_v = voxel_pool(
        np.concatenate(pcs),
        {"rgb": np.concatenate(rgbs), "mv": np.concatenate(feats)},
        np.concatenate(labs), voxel_size)
    t_fuse = time.time() - t0

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    import h5py

    # atomic write (resume skips existing files — see data/scene_io.py)
    tmp = out_path + ".tmp"
    with h5py.File(tmp, "w") as f:
        g = f.create_group("pointcloud")
        g.create_dataset("xyz", data=xyz_v.astype(np.float32))
        g.create_dataset("rgb", data=pooled["rgb"].astype(np.float32))
        # uint8 storage matches the Blender path's stage_scene contract;
        # an id >= 256 would silently wrap and scramble the label<->feature
        # pairing (ADVICE r1)
        assert len(lab_v) == 0 or int(np.max(lab_v)) < 256, int(np.max(lab_v))
        assert len(obj_ids) == 0 or int(np.max(obj_ids)) < 256, \
            int(np.max(obj_ids))
        g.create_dataset("label", data=lab_v.astype(np.uint8))
        m = f.create_group("multiview")
        m.create_dataset("patch", data=pooled["mv"].astype(np.float32))
        m.create_dataset("per_obj", data=per_obj.astype(np.float32))
        m.create_dataset("obj_ids", data=obj_ids.astype(np.uint8))
    os.replace(tmp, out_path)
    return {"points": len(xyz_v), "objects": len(obj_ids),
            "views": len(pcs), "t_clean": t_clean, "t_teacher": t_teacher,
            "t_fuse": t_fuse}


def run_regrad(args) -> None:
    """REGRAD offline ingest (reference preprocess_regrad_aggr_multiview,
    tools/preprocess_data.py:431-607): raw scenes -> processed h5py."""
    from ..core.config import load_cfg_from_cfg_file, merge_cfg_from_list
    from ..data.regrad import RegradDataset

    cfg = load_cfg_from_cfg_file(args.reader_config)
    if args.root:
        cfg = merge_cfg_from_list(cfg, ["root_dir", args.root])
    cfg.reference_frame = "world"  # reference :436
    ds = RegradDataset(cfg, args.split)
    K = _intrinsic_matrix(dict(ds.camera_info["intrinsic"]) if isinstance(
        ds.camera_info.get("intrinsic"), dict) else
        {"fx": ds.camera_info["intrinsic"][0][0],
         "fy": ds.camera_info["intrinsic"][1][1],
         "cx": ds.camera_info["intrinsic"][0][2],
         "cy": ds.camera_info["intrinsic"][1][2]}) \
        if "intrinsic" in ds.camera_info else np.array(
        [[1120.0, 0, 420], [0, 1120.0, 420], [0, 0, 1]], np.float32)
    poses = {v: np.asarray(ds.camera_info["extrinsic"][v])
             for v in range(1, ds.nviews + 1)}
    extractor = build_extractor(args)

    end = len(ds) if args.end < 0 else min(args.end, len(ds))
    for i in range(args.start, end):
        sid = ds.idx_to_scene_id(i)
        out_path = os.path.join(args.out, args.split, f"{sid}.h5py")
        if os.path.exists(out_path):  # idempotent resume (reference :192)
            print(f"{sid}: exists, skipping")
            continue
        try:
            scene = ds[i]
        except Exception as exc:  # reference :201-205 skips bad scenes
            print(f"{sid}: SKIP ({exc})")
            continue
        stats = process_regrad_scene(scene, poses, K, extractor, out_path,
                                     voxel_size=args.voxel_size)
        print(f"{sid}: {stats}")


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu offline ingest")
    p.add_argument("-ds", "--dataset",
                   choices=["Blender", "REGRAD", "Synthetic"],
                   required=True)
    p.add_argument("--reader-config", default="configs/REGRAD.yaml",
                   help="raw-reader config for -ds REGRAD")
    p.add_argument("-r", "--root", default=None, help="raw dataset root")
    p.add_argument("-c", "--out", required=True, help="processed output dir")
    p.add_argument("--models-root", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1,
                   help="end scene index, EXCLUSIVE (-1 = all)")
    p.add_argument("--voxel-size", type=float, default=0.02)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--clip-model", default="ViT-L/14@336px")
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--visual-prompt", default="crop-mask")
    p.add_argument("--crop-num-levels", type=int, default=1)
    p.add_argument("--crop-expansion-ratio", type=float, default=0.15)
    p.add_argument("--n-scenes", type=int, default=4, help="synthetic only")
    p.add_argument("--n-views", type=int, default=4, help="synthetic only")
    p.add_argument("--n-devices", type=int, default=1,
                   help="local chips to ingest on concurrently (scenes "
                        "round-robin over devices; Blender + Synthetic)")
    args = p.parse_args()
    if args.dataset == "Blender":
        assert args.root, "-r/--root required for Blender"
        run_blender(args)
    elif args.dataset == "REGRAD":
        run_regrad(args)
    else:
        run_synthetic(args)


if __name__ == "__main__":
    main()
