"""Trainer CLI end-to-end on synthetic data: two epochs over the 8-device
mesh with grounding eval, checkpointing, then resume (reference
tools/train_distil.py:60-283 semantics)."""

import glob
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_train_cli_e2e_and_resume(tmp_path, monkeypatch):
    from dropclip_tpu.data.synthetic import write_fake_processed_dataset
    from dropclip_tpu.tools import train_distil

    root = str(tmp_path / "data")
    write_fake_processed_dataset(root, n_scenes=8, splits=("train", "test"),
                                 n_objects=2, feat_dim=16)
    save_root = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
DATA:
  dataset: DistilBlender
  root_dir: {root}
  use_full_pc: True
  use_color: True
  voxel_size: 0.02
  voxel_capacity: 256
  evaluate: True
  batch_size: 8
  batch_size_val: 8
  workers: 2
  workers_val: 1
MODEL:
  arch_3d: tiny
  feat_dim: 16
  sparse_backend: bricks
  brick_shape: [4, 4, 2]
  clip_model: tiny-test
  clip_checkpoint: random
  sim_method: paired
  sim_norm_thresh: 0.6
  eval_task: grounding
TRAIN:
  base_lr: 0.003
  min_lr: 0.0003
  epochs: 2
  weight_decay: 0.00001
  max_norm: 5.0
  save_path: {save_root}
  save_freq: 1
  eval_freq: 1
  print_freq: 1
  manual_seed: 42
  visualize: True
""")

    monkeypatch.setattr(sys, "argv", ["train_distil", "--config", cfg_path])
    train_distil.main()

    # visualize: True dumps the reference's per-eval-epoch artifacts
    # (engine/distil.py:551-648): outputs.h5 + the 4-panel outputs.pcd
    vis_h5 = glob.glob(os.path.join(save_root, "**", "vis", "epoch-*",
                                    "rank-0", "outputs.h5"), recursive=True)
    vis_pcd = glob.glob(os.path.join(save_root, "**", "vis", "epoch-*",
                                     "rank-0", "outputs.pcd"), recursive=True)
    assert vis_h5 and vis_pcd, f"no visualization dumps under {save_root}"
    import h5py

    with h5py.File(vis_h5[0]) as h:
        n = h["raw_pc"].shape[0]
        assert h["outputs"].shape == (n, 16)
        assert h["targets"].shape == (n, 16)
        assert h["raw_rgb"].shape == (n, 3)
    from dropclip_tpu.viz import load_pcd

    pts, cols = load_pcd(vis_pcd[0])
    assert len(pts) == 4 * n and cols is not None

    lasts = glob.glob(os.path.join(save_root, "**", "last_model"),
                      recursive=True)
    assert lasts, f"no checkpoint under {save_root}"
    run_dir = os.path.dirname(lasts[0])
    assert glob.glob(os.path.join(run_dir, "best_sim_loss_model"))

    # resume: continues from epoch 1 and re-saves
    monkeypatch.setattr(sys, "argv", [
        "train_distil", "--config", cfg_path, "--opts",
        "resume", run_dir, "epochs", "3"])
    train_distil.main()


@pytest.mark.slow
def test_train_cli_scanned_parity(tmp_path, monkeypatch):
    """--opts scan_epochs N (VERDICT r4 #6): the lax.scan trainer must
    reproduce the per-step loop's optimizer trajectory over the same
    staged data. The dataset's per-epoch re-draws are frozen (set_epoch
    no-op) so both paths see identical batches — the documented boundary
    of the scanned mode; shuffle order and the dropout-key split chain
    are replayed exactly, so final params agree to reduction-order
    noise (the per-step arm runs DP-sharded over the virtual mesh, the
    scanned arm single-device)."""
    import orbax.checkpoint as ocp

    from dropclip_tpu.data import dataset_blender
    from dropclip_tpu.data.synthetic import write_fake_processed_dataset
    from dropclip_tpu.tools import train_distil

    monkeypatch.setattr(dataset_blender.MVTODDataset, "set_epoch",
                        lambda self, epoch: None)

    root = str(tmp_path / "data")
    write_fake_processed_dataset(root, n_scenes=8, splits=("train",),
                                 n_objects=2, feat_dim=16)
    cfg_tmpl = """
DATA:
  dataset: DistilBlender
  root_dir: {root}
  use_full_pc: True
  use_color: True
  voxel_size: 0.02
  voxel_capacity: 256
  evaluate: False
  batch_size: 8
  workers: 2
MODEL:
  arch_3d: tiny
  feat_dim: 16
  sparse_backend: bricks
  brick_shape: [4, 4, 2]
TRAIN:
  base_lr: 0.003
  min_lr: 0.0003
  epochs: 2
  weight_decay: 0.00001
  max_norm: 5.0
  save_path: {save}
  save_freq: 1
  print_freq: 1
  manual_seed: 42
{extra}"""
    runs = {}
    for name, extra in (("step", ""), ("scan", "  scan_epochs: 2")):
        save_root = str(tmp_path / f"exp_{name}")
        cfg_path = str(tmp_path / f"cfg_{name}.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg_tmpl.format(root=root, save=save_root, extra=extra))
        monkeypatch.setattr(sys, "argv",
                            ["train_distil", "--config", cfg_path])
        train_distil.main()
        lasts = glob.glob(os.path.join(save_root, "**", "last_model"),
                          recursive=True)
        assert lasts, f"no checkpoint under {save_root}"
        runs[name] = ocp.StandardCheckpointer().restore(lasts[0])

    import jax

    leaves_a = jax.tree.leaves(runs["step"]["params"])
    leaves_b = jax.tree.leaves(runs["scan"]["params"])
    assert len(leaves_a) == len(leaves_b) > 0
    # tolerance matches test_unet_bricks' train-mode fold parity: the
    # step arm reduces grads/BN over an 8-way DP sharding, the scan arm
    # single-device — reduction-order noise compounds over the 2 steps
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
    assert int(runs["scan"]["step"]) == int(runs["step"]["step"]) == 2


@pytest.mark.slow
def test_train_cli_with_view_clip(tmp_path, monkeypatch):
    """Trainer e2e with use_view_clip: single-view CLIP patch input
    features flow through the THREADED loader (lock-guarded extractor/
    cache) into the widened-input student (reference dataset_blender.py
    :52-71 arm, working version)."""
    import json

    import cv2

    from dropclip_tpu.data.synthetic import (make_camera_ring,
                                             write_fake_processed_dataset)
    from dropclip_tpu.tools import train_distil

    root = str(tmp_path / "data")
    write_fake_processed_dataset(root, n_scenes=4, splits=("train", "test"),
                                 n_objects=2, feat_dim=16, n_views=4)
    # matching raw tree: view pngs + cameras json per processed scene id
    rng = np.random.default_rng(5)
    poses = make_camera_ring(4)
    for split in ("train", "test"):
        for sid in sorted(os.listdir(os.path.join(root, split))):
            d = os.path.join(root, split, sid)
            cams = {}
            for v in range(4):
                img = rng.integers(0, 255, (48, 64, 3), np.uint8)
                cv2.imwrite(os.path.join(d, f"image.{sid}.rgb.{v:04d}.png"),
                            img[:, :, ::-1])
                cams[f"{v:04d}"] = {"world_matrix": poses[v].tolist()}
            json.dump(cams, open(os.path.join(d, f"cameras.{sid}.json"), "w"))

    save_root = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
DATA:
  dataset: DistilBlender
  root_dir: {root}
  use_full_pc: False
  use_k_views: 0
  use_view_ids: "1"
  use_view_clip: True
  view_clip_model: tiny-test
  view_clip_resize: [32, 32]
  view_clip_hw: [48, 64]
  view_clip_intrinsics: [50.0, 50.0, 31.5, 23.5]
  use_color: True
  voxel_size: 0.02
  voxel_capacity: 256
  evaluate: True
  batch_size: 8
  batch_size_val: 8
  workers: 2
  workers_val: 1
MODEL:
  arch_3d: tiny
  feat_dim: 16
  sparse_backend: bricks
  brick_shape: [4, 4, 2]
  clip_model: tiny-test
  clip_checkpoint: random
  sim_method: paired
  sim_norm_thresh: 0.6
  eval_task: grounding
TRAIN:
  base_lr: 0.003
  min_lr: 0.0003
  epochs: 1
  weight_decay: 0.00001
  max_norm: 5.0
  save_path: {save_root}
  save_freq: 1
  eval_freq: 1
  print_freq: 1
  manual_seed: 42
""")
    monkeypatch.setattr(sys, "argv", ["train_distil", "--config", cfg_path])
    train_distil.main()
    lasts = glob.glob(os.path.join(save_root, "**", "last_model"),
                      recursive=True)
    assert lasts, f"no checkpoint under {save_root}"
