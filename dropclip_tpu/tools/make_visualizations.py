"""Dump visualization point clouds per scene.

Counterpart of reference tools/make_visualizations.py:15-64 and the
training-time visualization dump (engine/distil.py:551-648): for each val
scene write .pcd files colored by rgb / instance labels / PCA of the
fused teacher targets / PCA of the student output.

Usage:
  python -m dropclip_tpu.tools.make_visualizations --config configs/DistilBlender.yaml \
      --opts root_dir DATA [resume CKPT] viz_dir ./viz [max_scenes 8]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import restore_checkpoint
from ..core.config import load_cfg, merge_cfg_from_list
from ..core.mesh import make_mesh
from ..data import build_dataset_for
from ..distill.engine import build_student_for, build_topology, make_eval_step
from ..distill.train_state import create_train_state, make_optimizer
from ..similarity import predict_from_embeddings
from ..viz import apply_pca, label_colors, save_pcd
from .train_distil import make_clip_sim, to_batch


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu visualization dumps")
    p.add_argument("--config", required=True)
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    a = p.parse_args()
    cfg = load_cfg(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)
    out_dir = cfg.viz_dir or "./viz"
    max_scenes = int(cfg.max_scenes or 8)

    # single-device mesh: viz walks scenes one at a time (batch 1 can't
    # shard over a data axis)
    mesh = make_mesh(n_data=1)
    cfg.evaluate = True
    _, val_ds, collate = build_dataset_for(cfg)

    state = eval_step = None
    if cfg.resume:
        model = build_student_for(cfg)
        example = collate([val_ds[0]])
        topo0 = build_topology(cfg, jnp.asarray(example["coords"]),
                               jnp.asarray(example["mask"]))
        tx = make_optimizer(cfg, 1)
        state = create_train_state(model, topo0,
                                   jnp.asarray(example["in_feats"]), tx)
        payload = {"step": state.step, "params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "epoch": 0, "best_val": 0.0}
        restored = restore_checkpoint(cfg.resume, payload)
        assert restored is not None, f"no checkpoint at {cfg.resume}"
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        eval_step = jax.jit(make_eval_step(cfg))

    clip_sim = make_clip_sim(cfg) if cfg.viz_query else None

    for i in range(min(max_scenes, len(val_ds))):
        item = val_ds[i]
        b = collate([item])
        m = np.asarray(item["mask"])
        # voxel centers in metric space = coords * voxel_size
        xyz = np.asarray(item["coords"], np.float32)[m] \
            * float(cfg.voxel_size or 0.05)
        rgb = np.asarray(item["in_feats"])[m][:, 3:6] \
            if item["in_feats"].shape[-1] >= 6 else None
        labels = np.asarray(item["labels"])[m]
        targets = np.asarray(item["targets"])[m]
        sid = item["scene_id"]

        if rgb is not None:
            save_pcd(os.path.join(out_dir, f"{sid}_rgb.pcd"), xyz,
                     np.clip(rgb, 0, 1))
        save_pcd(os.path.join(out_dir, f"{sid}_label.pcd"), xyz,
                 label_colors(labels))
        save_pcd(os.path.join(out_dir, f"{sid}_target_pca.pcd"), xyz,
                 apply_pca(targets))
        if eval_step is not None:
            out, _ = eval_step(state, to_batch(b, mesh))
            feats = np.asarray(out[0])[m]
            save_pcd(os.path.join(out_dir, f"{sid}_student_pca.pcd"), xyz,
                     apply_pca(feats))
            # combined side-by-side panels (rgb | label | PCA(student) |
            # PCA(targets)) in one file — the reference's viz_feat_scene /
            # viz_multiview_feat_scene window as a dump (utils/viz.py:557-604)
            from ..viz import export_feat_scene

            export_feat_scene(
                os.path.join(out_dir, f"{sid}_panels.pcd"), xyz,
                np.clip(rgb, 0, 1) if rgb is not None
                else np.full((len(xyz), 3), 0.6), labels, feats,
                patch_feat=targets,
                trans_factor=float(np.ptp(xyz[:, 0]) * 1.2 + 1e-3))

            # language-conditioned dumps (file-output counterparts of the
            # reference's interactive similarity/grasp viewers,
            # utils/viz.py:426-625): --opts viz_query "the red mug"
            if cfg.viz_query and clip_sim is not None:
                import jax.numpy as _jnp

                from ..similarity import NEGATIVE_PROMPT_GENERIC
                from ..viz import export_grasp_scene, export_similarity_heatmap

                pos = clip_sim.encode_text([str(cfg.viz_query)])[0]
                negs = clip_sim.encode_text(list(NEGATIVE_PROMPT_GENERIC))
                pred, sims = predict_from_embeddings(
                    _jnp.asarray(feats), pos, negs,
                    method=cfg.sim_method or "paired",
                    threshold=float(cfg.sim_norm_thresh or 0.75))
                export_similarity_heatmap(
                    os.path.join(out_dir, f"{sid}_query_heatmap.pcd"), xyz,
                    np.asarray(sims),
                    threshold=float(cfg.sim_norm_thresh or 0.75))
                # heatmap | thresholded-prediction panels in one file
                # (reference viz_clip_pred, utils/viz.py:607-614)
                from ..viz import export_clip_pred

                s = np.asarray(sims, np.float32)
                rngs = s.max() - s.min()
                export_clip_pred(
                    os.path.join(out_dir, f"{sid}_query_pred.pcd"), xyz,
                    np.asarray(pred, bool),
                    (s - s.min()) / (rngs if rngs > 0 else 1.0),
                    background=(np.clip(rgb, 0, 1) if rgb is not None
                                else np.full((len(xyz), 3), 0.6)),
                    trans_factor=float(np.ptp(xyz[:, 0]) * 1.2 + 1e-3))

                # ranked grasp scene: synthesize antipodal candidates at
                # high-similarity points when the dataset carries no grasp
                # annotations (MV-TOD grasp h5s are dead in the reference
                # too, blender.py:207)
                from ..grasp.grasps import SceneGrasps, rank_grasps_by_query

                top = np.argsort(-np.asarray(sims))[:32]
                poses = np.tile(np.eye(4), (len(top), 1, 1))
                poses[:, :3, 3] = xyz[top] + np.array([0, 0, 0.08])
                cand = SceneGrasps(indices=top, poses=poses,
                                   scores=np.asarray(sims)[top],
                                   labels=labels[top])
                order, _ = rank_grasps_by_query(
                    _jnp.asarray(xyz), _jnp.asarray(feats),
                    _jnp.ones(len(xyz), bool),
                    _jnp.asarray(poses[:, :3, 3]),
                    _jnp.asarray(cand.scores), pos, negs)
                export_grasp_scene(
                    os.path.join(out_dir, f"{sid}_query"), xyz,
                    np.clip(rgb, 0, 1) if rgb is not None else None,
                    cand, order=np.asarray(order), top_k=10)
        print(f"dumped {sid} -> {out_dir}")


if __name__ == "__main__":
    main()
