"""Convert a reference torch student checkpoint into this framework.

Loads the reference's ``.pth`` (reference tools/train_distil.py:255-271
save format, e.g. the distributed ``best_val_miou_model_fine_tune.pth``,
README.md:29), maps it via sparse.convert_student, and writes an orbax
checkpoint in the layout train_distil/validate_blender/GroundingPipeline
consume.

Usage:
  python -m dropclip_tpu.tools.convert_checkpoint \
      --torch-ckpt best_val_miou_model_fine_tune.pth \
      --out exp/converted --config configs/DistilBlender.yaml \
      [--opts feat_dim 768 ...] [--offset-order x_fastest]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu checkpoint converter")
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--config", default="configs/DistilBlender.yaml")
    p.add_argument("--name", default="best_sim_loss_model")
    p.add_argument("--offset-order", default="x_fastest",
                   choices=["x_fastest", "z_fastest"],
                   help="assumed ME kernel-offset ordering; flip if "
                        "converted predictions look scrambled")
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from ..core.checkpoint import save_checkpoint
    from ..core.config import load_cfg_from_cfg_file, merge_cfg_from_list
    from ..distill.engine import build_student_for, build_topology
    from ..distill.train_state import create_train_state, make_optimizer
    from ..sparse.convert_student import from_minkowski_state_dict

    cfg = load_cfg_from_cfg_file(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)

    obj = torch.load(a.torch_ckpt, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else \
        obj.state_dict()
    params, stats = from_minkowski_state_dict(
        sd, arch=cfg.arch_3d or "MinkUNet14D", offset_order=a.offset_order)

    # skeleton state for the optimizer pytree, then graft the weights in
    model = build_student_for(cfg)
    cap = int(cfg.voxel_capacity or 8192)
    coords = jnp.zeros((1, cap, 3), jnp.int32)
    mask = jnp.zeros((1, cap), bool).at[:, :8].set(True)
    feats = jnp.zeros((1, cap, 6 if cfg.use_color else 3), jnp.float32)
    topo = build_topology(cfg, coords, mask)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(model, topo, feats, tx)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats))
    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats,
               "opt_state": state.opt_state, "epoch": 0, "best_val": 0.0}
    save_checkpoint(a.out, payload, name=a.name)
    # audit trail (ADVICE r1): a wrong offset_order loads cleanly and only
    # shows up as scrambled predictions — record the choice next to the
    # checkpoint so downstream consumers can check/flip it
    import json

    with open(os.path.join(a.out, "convert_meta.json"), "w") as f:
        json.dump({"source": a.torch_ckpt, "arch": cfg.arch_3d or
                   "MinkUNet14D", "offset_order": a.offset_order}, f,
                  indent=2)
    n = len(jax.tree.leaves(state.params))
    print(f"converted {a.torch_ckpt} -> {a.out}/{a.name} "
          f"({n} param tensors, offset order {a.offset_order})")


if __name__ == "__main__":
    main()
