"""Standalone grounding evaluation of a trained student (or of the fused
teacher features themselves — the fusion-quality upper bound).

Counterpart of reference tools/validate_blender.py:80-320 and
tools/validate_upper_bound.py:164-313 (whose grounding branch is the same
loop with ``out = targets``, :191-192): load a checkpoint into the student,
run the MV-TOD val split, ground every eval query with configurable
negatives, report mIoU / Pr@{25,50,75} / DistilLoss, dump json.

Usage:
  python -m dropclip_tpu.tools.validate_blender --config configs/DistilBlender.yaml \
      --opts resume PATH [eval_upper_bound True] [sim_negatives scene] ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import restore_checkpoint
from ..core.config import CfgNode, load_cfg, merge_cfg_from_list
from ..core.logging import setup_logger
from ..core.mesh import make_mesh
from ..data.dataset_blender import MVTODDataset
from ..data.loader import DataLoader
from ..distill.engine import build_student_for, build_topology, make_eval_step
from ..distill.evaluate import validate_grounding
from ..distill.train_state import create_train_state, make_optimizer
from .train_distil import make_clip_sim, to_batch


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu grounding validation")
    p.add_argument("--config", required=True)
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    a = p.parse_args()
    cfg = load_cfg(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)
    logger = setup_logger("dropclip.val")

    mesh = make_mesh()
    val_ds = MVTODDataset(cfg, split=cfg.val_split or "test")
    loader = DataLoader(val_ds, int(cfg.batch_size_val or 8),
                        MVTODDataset.collate, shuffle=False,
                        num_workers=int(cfg.workers_val or 2),
                        shard_index=jax.process_index(),
                        num_shards=jax.process_count())

    upper_bound = bool(cfg.eval_upper_bound)
    state = None
    eval_step = None
    if not upper_bound:
        model = build_student_for(cfg)
        example = MVTODDataset.collate([val_ds[0]])
        # same capacity autotune as the trainer (smaller static caps ->
        # faster eval; slack absorbs scene variance), honoring the same
        # disable flag so train/eval topologies can't silently diverge
        autotune = (cfg.autotune_capacities
                    if cfg.autotune_capacities is not None else True)
        if ((cfg.sparse_backend or "bricks") == "bricks"
                and not cfg.brick_capacities and autotune):
            from ..distill.engine import brick_shape_of
            from ..sparse.bricks import autotune_brick_capacities

            sample = MVTODDataset.collate(
                [val_ds[i % len(val_ds)] for i in range(16)])
            cfg.brick_capacities = list(autotune_brick_capacities(
                np.asarray(sample["coords"]), np.asarray(sample["mask"]),
                num_levels=int(cfg.num_levels or 5), slack=1.5,
                brick_shape=brick_shape_of(cfg)))
        topo0 = build_topology(cfg, jnp.asarray(example["coords"]),
                               jnp.asarray(example["mask"]))
        tx = make_optimizer(cfg, 1)
        state = create_train_state(model, topo0,
                                   jnp.asarray(example["in_feats"]), tx)
        assert cfg.resume, "--opts resume CKPT_DIR required (or eval_upper_bound)"
        payload = {"step": state.step, "params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "epoch": 0, "best_val": 0.0}
        restored = restore_checkpoint(cfg.resume, payload,
                                      name=cfg.ckpt_name or "last_model")
        assert restored is not None, f"no checkpoint at {cfg.resume}"
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        logger.info("loaded checkpoint %s (step %d)", cfg.resume,
                    int(restored["step"]))
        eval_step = jax.jit(make_eval_step(cfg))

    clip_sim = make_clip_sim(cfg)
    assert clip_sim is not None, "grounding eval needs clip_checkpoint"

    def forward(b):
        if upper_bound:  # score the fused targets themselves (:191-192)
            return jnp.asarray(b["targets"]), 0.0
        out, m = eval_step(state, to_batch(b, mesh))
        dropped = int(m.get("dropped_voxels", 0))
        if dropped and not cfg.allow_capacity_overflow:
            # a truncated scene silently deflates every metric — fail
            # loudly unless the caller opted in (--opts
            # allow_capacity_overflow True)
            raise AssertionError(
                f"{dropped} voxels dropped by brick-capacity/extent "
                "overflow during validation; raise brick_capacities or "
                "grid_bits, or pass allow_capacity_overflow True")
        return out, m["distil_loss"]

    cls_list = None
    if cfg.sim_negatives == "all":
        cls_path = os.path.join(cfg.root_dir, "cls_list.json")
        cls_list = list(json.load(open(cls_path)).values())

    res = validate_grounding(loader, forward, clip_sim, cfg,
                             cls_list=cls_list)
    eval_cfg = (f"scenario[{cfg.eval_scenario}]-negatives[{cfg.sim_negatives}]"
                f"-method[{cfg.sim_method}]-thr[{cfg.sim_norm_thresh}]"
                f"{'-UPPERBOUND' if upper_bound else ''}")
    logger.info("%s -> %s", eval_cfg, res)

    if cfg.save_results_path:
        os.makedirs(os.path.dirname(cfg.save_results_path) or ".",
                    exist_ok=True)
        with open(cfg.save_results_path, "w") as f:
            json.dump({"eval_cfg": eval_cfg, **res}, f, indent=2)
        logger.info("results -> %s", cfg.save_results_path)
    print(json.dumps({"eval_cfg": eval_cfg, **res}))


if __name__ == "__main__":
    main()
