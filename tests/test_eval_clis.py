"""E2E drives of the evaluation CLIs on synthetic data: the run_eval
ablation driver (reference scripts/run_eval.py:103-329, no student) and
validate_blender's fusion upper-bound branch (reference
tools/validate_upper_bound.py:191-192 ``out = targets``)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_run_eval_synthetic(monkeypatch, capsys):
    from dropclip_tpu.tools import run_eval

    monkeypatch.setattr(sys, "argv", [
        "run_eval", "-ds", "Synthetic", "--n-scenes", "2",
        "--clip-model", "tiny-test", "--cloud_capacity", "4096",
        "--max_objects", "8", "--voxel_size", "0.02"])
    run_eval.main()
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_scenes"] == 2
    assert {"mIoU", "Pr@25", "Pr@50", "Pr@75"} <= set(res["mean"])
    assert np.isfinite(res["mean"]["mIoU"])


@pytest.mark.slow
def test_validate_blender_upper_bound(tmp_path, monkeypatch, capsys):
    from dropclip_tpu.data.synthetic import write_fake_processed_dataset
    from dropclip_tpu.tools import validate_blender

    root = str(tmp_path / "data")
    write_fake_processed_dataset(root, n_scenes=8, splits=("test",),
                                 n_objects=2, feat_dim=16)
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
  batch_size_val: 8
  workers_val: 1
MODEL:
  feat_dim: 16
  clip_model: tiny-test
  clip_checkpoint: random
  sim_method: paired
  sim_norm_thresh: 0.6
  sim_negatives: generic
  eval_upper_bound: True
  eval_scenario: cls
""")
    monkeypatch.setattr(sys, "argv",
                        ["validate_blender", "--config", cfg_path])
    validate_blender.main()
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert "UPPERBOUND" in res["eval_cfg"]
    assert np.isfinite(res["mIoU"])
    assert res["DistilLoss"] == 0.0


@pytest.mark.slow
def test_run_eval_teacher_cache(monkeypatch, capsys, tmp_path):
    """--cache-dir: second run reuses the cached teacher features — the
    reference's chp_folder workflow for ablation sweeps (scripts/
    run_eval.py:165-227). Proven by breaking extraction before rerun."""
    import os

    from dropclip_tpu.tools import run_eval

    cache = str(tmp_path / "feats")
    argv = ["run_eval", "-ds", "Synthetic", "--n-scenes", "1",
            "--clip-model", "tiny-test", "--cloud_capacity", "4096",
            "--max_objects", "8", "--voxel_size", "0.02",
            "--use_obj_prior", "1", "--cache-dir", cache]
    monkeypatch.setattr(sys, "argv", argv)
    run_eval.main()
    first = json.loads([l for l in capsys.readouterr().out.splitlines()
                        if l.startswith("{")][-1])
    files = os.listdir(cache)
    assert any(f.endswith(".npz") and "_objprior_" in f for f in files)

    from dropclip_tpu.teachers.extractor import ClipExtractor

    def _boom(self, *a, **k):
        raise AssertionError("extraction ran despite a warm cache")

    monkeypatch.setattr(ClipExtractor, "extract_obj_prior", _boom)
    monkeypatch.setattr(sys, "argv", argv)
    run_eval.main()
    second = json.loads([l for l in capsys.readouterr().out.splitlines()
                         if l.startswith("{")][-1])
    assert first["mean"] == second["mean"]


@pytest.mark.slow
def test_run_eval_all_negatives(monkeypatch, capsys):
    """--sim_negatives all: every dataset class except the target's own
    is the negative set (reference scripts/run_eval.py:262-263; the
    RUN_sim_kernel.bash grid runs this arm)."""
    from dropclip_tpu.tools import run_eval

    monkeypatch.setattr(sys, "argv", [
        "run_eval", "-ds", "Synthetic", "--n-scenes", "1",
        "--clip-model", "tiny-test", "--cloud_capacity", "4096",
        "--max_objects", "8", "--voxel_size", "0.02",
        "--sim_negatives", "all"])
    run_eval.main()
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_scenes"] == 1
    assert np.isfinite(res["mean"]["mIoU"])
