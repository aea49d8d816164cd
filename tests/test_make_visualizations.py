"""make_visualizations CLI end-to-end on a synthetic dataset: pcd dumps
(rgb/label/PCA) plus the language-conditioned similarity-heatmap and
ranked-grasp-scene exports behind --opts viz_query (reference
utils/viz.py:426-625 as file outputs)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dropclip_tpu.core.config import CfgNode


@pytest.mark.slow
def test_viz_cli_with_query(tmp_path, monkeypatch):
    from dropclip_tpu.core.checkpoint import save_checkpoint
    from dropclip_tpu.data.synthetic import write_fake_processed_dataset
    from dropclip_tpu.data import build_dataset_for
    from dropclip_tpu.distill.engine import build_student_for, build_topology
    from dropclip_tpu.distill.train_state import (create_train_state,
                                                  make_optimizer)
    from dropclip_tpu.tools import make_visualizations

    root = str(tmp_path / "data")
    write_fake_processed_dataset(root, n_scenes=1, splits=("test",),
                                 n_objects=2, feat_dim=16)

    cfg_path = str(tmp_path / "cfg.yaml")
    ckpt_dir = str(tmp_path / "ckpt")
    viz_dir = str(tmp_path / "viz")
    with open(cfg_path, "w") as f:
        f.write(f"""
DATA:
  dataset: DistilBlender
  root_dir: {root}
  use_full_pc: True
  use_color: True
  voxel_size: 0.02
  voxel_capacity: 256
MODEL:
  arch_3d: tiny
  feat_dim: 16
  sparse_backend: bricks
  brick_shape: [4, 4, 2]
  brick_capacities: [64, 64, 64, 64, 64]
  clip_model: tiny-test
  clip_checkpoint: random
  sim_method: paired
  sim_norm_thresh: 0.6
TRAIN:
  base_lr: 0.0003
  min_lr: 0.0001
  epochs: 1
  weight_decay: 0.00001
  max_norm: 5.0
""")

    # checkpoint with the exact state structure the CLI rebuilds
    cfg = CfgNode(dict(arch_3d="tiny", feat_dim=16, sparse_backend="bricks",
                       brick_shape=[4, 4, 2],
                       brick_capacities=[64, 64, 64, 64, 64],
                       base_lr=3e-4, min_lr=1e-4, epochs=1,
                       weight_decay=1e-5, max_norm=5.0, dataset="DistilBlender",
                       root_dir=root, use_full_pc=True, use_color=True,
                       voxel_size=0.02, voxel_capacity=256, evaluate=True))
    _, val_ds, collate = build_dataset_for(cfg)
    example = collate([val_ds[0]])
    model = build_student_for(cfg)
    topo = build_topology(cfg, jnp.asarray(example["coords"]),
                          jnp.asarray(example["mask"]))
    tx = make_optimizer(cfg, 1)
    state = create_train_state(model, topo, jnp.asarray(example["in_feats"]),
                               tx)
    save_checkpoint(ckpt_dir, {
        "step": state.step, "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state,
        "epoch": 0, "best_val": 0.0})

    monkeypatch.setattr(sys, "argv", [
        "make_visualizations", "--config", cfg_path, "--opts",
        "resume", ckpt_dir, "viz_dir", viz_dir, "max_scenes", "1",
        "viz_query", "mug"])
    make_visualizations.main()

    files = os.listdir(viz_dir)
    assert any(f.endswith("_rgb.pcd") for f in files), files
    assert any(f.endswith("_label.pcd") for f in files), files
    assert any(f.endswith("_target_pca.pcd") for f in files), files
    assert any(f.endswith("_student_pca.pcd") for f in files), files
    assert any(f.endswith("_query_heatmap.pcd") for f in files), files
    assert any(f.endswith("_panels.pcd") for f in files), files
    assert any(f.endswith("_query_pred.pcd") for f in files), files
    assert any(f.endswith("_query_grasps.obj") for f in files), files
    assert any(f.endswith("_query_cloud.pcd") for f in files), files
