"""Distillation training CLI.

TPU-native counterpart of the reference trainer (reference
tools/train_distil.py:39-283): same config semantics, recipe (AdamW
amsgrad + per-iteration SGDR cosine LR, grad-clip, cosine distil loss, k
random views per sample, best-by-val-sim-loss checkpointing) — but the
process model is SPMD instead of mp.spawn+NCCL: ONE process per host, a
1-D device mesh with the batch sharded on the ``data`` axis, and XLA
inserting the gradient/batch-stat all-reduces (replacing DDP + SyncBN,
reference :124-144). bf16 replaces AMP fp16 + GradScaler.

Usage:
  python -m dropclip_tpu.tools.train_distil --config configs/DistilBlender.yaml \
      [--opts key value ...]
"""

from __future__ import annotations

import argparse
import datetime
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.checkpoint import restore_checkpoint, save_checkpoint
from ..core.config import CfgNode, load_cfg, merge_cfg_from_list
from ..core.logging import setup_logger
from ..core.mesh import DATA_AXIS, make_mesh
from ..core.meters import AverageMeter, ProgressMeter
from ..distill.engine import (DistilBatch, build_student_for, build_topology,
                              make_eval_step, make_scanned_train,
                              make_train_step)
from ..distill.evaluate import validate_grounding
from ..distill.train_state import create_train_state, make_optimizer
from ..data import build_dataset_for
from ..data.loader import DataLoader


def get_parser() -> CfgNode:
    p = argparse.ArgumentParser("dropclip_tpu distillation trainer")
    p.add_argument("--config", required=True)
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    a = p.parse_args()
    cfg = load_cfg(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)
    return cfg


def to_batch(b, mesh) -> DistilBatch:
    arrays = dict(
        coords=np.asarray(b["coords"]), mask=np.asarray(b["mask"]),
        in_feats=np.asarray(b["in_feats"]), targets=np.asarray(b["targets"]),
        labels=np.asarray(b["labels"], np.int32),
        labels_cls=np.asarray(b.get("labels_cls",
                                    np.zeros_like(b["labels"])), np.int32))
    if jax.process_count() > 1:
        # each process's loader yields its shard (global_batch / n_proc
        # rows); assemble them into one global batch-sharded array. A
        # plain device_put onto a cross-process sharding would require
        # the SAME value on every process and silently (or loudly)
        # mis-assemble per-process shards.
        from jax.experimental import multihost_utils

        arrays = multihost_utils.host_local_array_to_global_array(
            arrays, mesh, P(DATA_AXIS))
    else:
        sh = NamedSharding(mesh, P(DATA_AXIS))
        arrays = {k: jax.device_put(v, sh) for k, v in arrays.items()}
    return DistilBatch(**arrays)


def make_clip_sim(cfg):
    """Text encoder for grounding eval; None when no checkpoint is given
    (synthetic/dev runs — val then reports distil loss only).
    ``clip_checkpoint: random`` builds random weights (pipeline smoke)."""
    if not cfg.clip_checkpoint:
        return None
    from ..similarity import ClipSimilarity
    from ..teachers.clip import build_clip

    model = build_clip(cfg.clip_model or "ViT-L/14@336px", dtype=jnp.bfloat16)
    if cfg.clip_checkpoint == "random":
        px = jnp.zeros((1, model.image_resolution, model.image_resolution, 3))
        toks = jnp.zeros((1, model.context_length), jnp.int32)
        variables = jax.jit(lambda p, t: model.init(
            jax.random.PRNGKey(0), p, t))(px, toks)
    else:
        from ..teachers.convert import load_params

        variables = {"params": load_params(cfg.clip_checkpoint)}
    return ClipSimilarity(model, variables,
                          method=cfg.sim_method or "paired",
                          threshold=float(cfg.sim_norm_thresh or 0.7))


def dump_visualization(val_ds, collate, eval_forward, epoch: int,
                       save_dir: str, cfg, local_bs: int) -> str:
    """Training-time visualization dump (reference engine/distil.py
    :551-648, triggered by args.visualize at tools/train_distil.py:248):
    one random val scene per eval epoch goes to
    ``<save_dir>/vis/epoch-{E}/rank-{R}/`` as

    - ``outputs.h5`` — raw_pc / raw_rgb / outputs / targets datasets
      (the reference writes these into a file it names outputs.pcd,
      :586-591; same payload, honest extension here), and
    - ``outputs.pcd`` — the 4-panel side-by-side cloud: rgb | label
      colors | PCA(targets) | PCA(outputs), x-offset per panel
      (:597-604).
    """
    import h5py

    from ..viz import apply_pca, label_colors, save_pcd

    rng = np.random.default_rng(int(cfg.manual_seed or 42) + epoch)
    idx = int(rng.integers(len(val_ds)))
    b = collate([val_ds[idx]] * local_bs)  # loader batch shape: no recompile
    out, _ = eval_forward(b)
    mask = np.asarray(b["mask"])[0].astype(bool)
    feats = np.asarray(b["in_feats"])[0][mask]
    xyz = feats[:, :3]
    rgb = (np.clip(feats[:, 3:6], 0, 1) if feats.shape[1] >= 6
           else np.full_like(xyz, 0.5))
    targets = np.asarray(b["targets"])[0][mask]
    labels = np.asarray(b["labels"])[0][mask].astype(int)
    preds = np.asarray(out)[0][mask]

    tgt_dir = os.path.join(save_dir, "vis", f"epoch-{epoch}",
                           f"rank-{jax.process_index()}")
    os.makedirs(tgt_dir, exist_ok=True)
    with h5py.File(os.path.join(tgt_dir, "outputs.h5"), "w") as h:
        h.create_dataset("raw_pc", data=xyz.astype(np.float32))
        h.create_dataset("raw_rgb", data=rgb.astype(np.float32))
        h.create_dataset("outputs", data=preds.astype(np.float32))
        h.create_dataset("targets", data=targets.astype(np.float32))
    # panel offset scales with the scene (the reference's fixed 0.5
    # assumes tabletop extents)
    off = float(np.ptp(xyz[:, 0])) * 1.1 + 1e-3
    panels = [rgb, label_colors(labels), apply_pca(targets),
              apply_pca(preds)]
    pts = np.concatenate([xyz + np.array([off * i, 0.0, 0.0])
                          for i in range(len(panels))])
    save_pcd(os.path.join(tgt_dir, "outputs.pcd"), pts,
             np.concatenate(panels))
    return tgt_dir


def _run_scanned(cfg, state, train_ds, val_loader, collate, mesh, logger,
                 save_dir, dropout_key, start_epoch, eval_step, clip_sim,
                 wandb_run, best_val) -> None:
    """lax.scan training path (``--opts scan_epochs N``).

    Pre-stages the whole padded dataset as ONE DistilBatch with a scene
    axis and replays the per-step loop's exact semantics inside the scan
    (same DataLoader shuffle fold per epoch, same dropout-key split
    chain, same optimizer steps — parity vs the per-step loop over the
    same staged data is tested in tests/test_train_cli.py). See
    engine.make_scanned_train for the design; boundary notes at the call
    site in main()."""
    assert jax.process_count() == 1, \
        "scan_epochs: single-process only (pre-staged global batch)"
    assert mesh.devices.size == 1, \
        "scan_epochs: single-device only (the scan gathers batches from " \
        "the staged data without a data-axis sharding; use the per-step " \
        "loop for multi-chip DP)"
    if cfg.use_augmentation:
        logger.warning("scan_epochs with use_augmentation: augmentation "
                       "draws are FROZEN at epoch %d (pre-staged data); "
                       "use the per-step loop for fresh per-epoch draws",
                       start_epoch)
    bsz = int(cfg.batch_size or 8)
    n = len(train_ds)
    assert n >= 1, "empty train dataset"
    if hasattr(train_ds, "set_epoch"):
        train_ds.set_epoch(start_epoch)
    logger.info("scan_epochs=%s: pre-staging %d scenes", cfg.scan_epochs, n)
    staged = collate([train_ds[i] for i in range(n)])
    staged_bytes = 0
    for v in staged.values():
        try:
            staged_bytes += np.asarray(v).nbytes
        except (ValueError, TypeError):
            pass  # ragged host-side fields (e.g. per-scene query dicts)
    if staged_bytes > 4 << 30:
        raise ValueError(
            f"scan_epochs: staged dataset is {staged_bytes / 2**30:.1f} GiB "
            "— too large to hold on device; use the per-step loader loop")
    z = np.zeros_like(np.asarray(staged["labels"]), dtype=np.int32)
    data_all = DistilBatch(
        coords=jnp.asarray(staged["coords"]),
        mask=jnp.asarray(staged["mask"]),
        in_feats=jnp.asarray(staged["in_feats"]),
        targets=jnp.asarray(staged["targets"]),
        labels=jnp.asarray(np.asarray(staged["labels"], np.int32)),
        labels_cls=jnp.asarray(np.asarray(staged.get("labels_cls", z),
                                          np.int32)))

    def epoch_rows(epoch: int) -> np.ndarray:
        """Mirror DataLoader._order + drop_last batching exactly."""
        idx = np.arange(n)
        rng = np.random.default_rng((int(cfg.manual_seed or 42), epoch))
        rng.shuffle(idx)
        nb = n // bsz
        return idx[: nb * bsz].reshape(nb, bsz).astype(np.int32)

    chunk_fn = jax.jit(make_scanned_train(cfg), donate_argnums=0)
    epochs = int(cfg.epochs or 200)
    scan_n = int(cfg.scan_epochs)
    key = dropout_key
    for c0 in range(start_epoch, epochs, scan_n):
        c1 = min(c0 + scan_n, epochs)
        rows = np.concatenate([epoch_rows(e) for e in range(c0, c1)])
        if not len(rows):
            raise ValueError(f"scan_epochs: batch_size {bsz} > dataset {n}")
        t0 = time.time()
        state, key, mstack = chunk_fn(state, data_all, jnp.asarray(rows), key)
        loss_tail = float(np.asarray(mstack["distil_loss"])[-1])
        dropped = int(np.sum(np.asarray(mstack.get("dropped_voxels", 0))))
        logger.info("scan epochs [%d..%d): distil_loss %.4f (%.1fs)",
                    c0, c1, loss_tail, time.time() - t0)
        if dropped:
            logger.warning("chunk [%d..%d): %d voxels/bricks dropped by "
                           "capacity overflow — raise brick_capacities",
                           c0, c1, dropped)
        if wandb_run is not None:
            wandb_run.log({"train/distil_loss": loss_tail,
                           "train/step": int(state.step)})

        val_loss = loss_tail
        if val_loader is not None:
            def eval_forward(b):
                out, m = eval_step(state, to_batch(b, mesh))
                return out, m["distil_loss"]

            if clip_sim is not None and cfg.eval_task in ("all", "grounding"):
                res = validate_grounding(val_loader, eval_forward, clip_sim,
                                         cfg)
                logger.info("Eval Grounding: Epoch=[%d/%s] %s", c1 - 1,
                            epochs, res)
                val_loss = res["DistilLoss"]
                if wandb_run is not None:
                    wandb_run.log({"val_steps": c1 - 1,
                                   **{f"validation/{k}": v
                                      for k, v in res.items()}})
            else:
                losses = [float(eval_forward(b)[1]) for b in val_loader]
                val_loss = float(np.mean(losses)) if losses else loss_tail
                logger.info("Eval: Epoch=[%d/%s] DistilLoss=%.4f", c1 - 1,
                            epochs, val_loss)
        is_best = val_loss < best_val
        best_val = min(val_loss, best_val)
        save_checkpoint(save_dir, {
            "step": state.step, "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "epoch": c1 - 1,
            "best_val": best_val}, best=is_best)
        logger.info("saved checkpoint (epoch %d, best=%s)", c1 - 1, is_best)


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    cfg = get_parser()
    # multi-host rendezvous (reference dist_url/world_size/rank plumbing,
    # config/DistilBlender.yaml:81-86) — no-op unless dist_coordinator set
    from ..core.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(cfg)
    stamp = datetime.datetime.now().strftime("%d-%m-%Y-%H:%M")
    save_dir = os.path.join(cfg.save_path or "./experiments",
                            f"Distill-{cfg.dataset}", stamp)
    logger = setup_logger("dropclip", save_dir=save_dir)
    logger.info("config:\n%s", cfg)

    wandb_run = None
    if cfg.use_wandb and jax.process_index() == 0:
        try:
            import wandb

            wandb_run = wandb.init(project=cfg.wandb_project or "dropclip_tpu",
                                   name=stamp, config=dict(cfg))
            wandb_run.define_metric("val_steps")
            wandb_run.define_metric("validation/*", step_metric="val_steps")
        except ImportError:
            logger.warning("use_wandb=True but wandb is not installed")

    np.random.seed(int(cfg.manual_seed or 42))
    if int(cfg.scan_epochs or 0) > 0:
        # scanned path is single-device by design (see _run_scanned);
        # pin the mesh so extra visible devices (virtual CPU meshes)
        # don't trip the DP sharding asserts below
        mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    else:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    logger.info("mesh: %d devices on '%s' axis (%s)", n_dev, DATA_AXIS,
                jax.devices()[0].platform)
    assert int(cfg.batch_size or 8) % n_dev == 0, (
        f"global batch {cfg.batch_size} must divide over {n_dev} devices")
    assert int(cfg.batch_size_val or 8) % n_dev == 0, (
        f"val batch {cfg.batch_size_val} must divide over {n_dev} devices")

    # each process loads its slice of the GLOBAL batch (the reference's
    # global-batch-divided-per-GPU contract, ref train_distil.py:146-147);
    # to_batch assembles the slices into one global batch-sharded array
    nproc = jax.process_count()
    assert int(cfg.batch_size or 8) % nproc == 0
    train_ds, val_ds, collate = build_dataset_for(cfg)
    train_loader = DataLoader(
        train_ds, int(cfg.batch_size or 8) // nproc, collate, shuffle=True,
        num_workers=int(cfg.workers or 8), seed=int(cfg.manual_seed or 42),
        shard_index=jax.process_index(), num_shards=nproc)
    val_loader = None
    if val_ds is not None:
        val_loader = DataLoader(
            val_ds, max(int(cfg.batch_size_val or 8) // nproc, 1), collate,
            shuffle=False, num_workers=int(cfg.workers_val or 2),
            shard_index=jax.process_index(), num_shards=nproc)

    model = build_student_for(cfg)
    iters_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(cfg, iters_per_epoch)

    # static brick-capacity autotune from a data sample: every brick conv
    # scales with capacity and the default M//8 heuristic over-allocates
    # 25-50% per level on real scenes (2x at the coarse decoder levels).
    # slack 1.5 absorbs augmentation variance; a scene exceeding capacity
    # only drops its overflow bricks (masked voxels), it does not error.
    # Disable with --opts autotune_capacities False or pin explicit
    # per-level counts with brick_capacities.
    autotune = (cfg.autotune_capacities
                if cfg.autotune_capacities is not None else True)
    if ((cfg.sparse_backend or "bricks") == "bricks"
            and not cfg.brick_capacities and autotune):
        from ..distill.engine import brick_shape_of
        from ..sparse.bricks import autotune_brick_capacities

        sample = collate([train_ds[i % len(train_ds)] for i in range(16)])
        cfg.brick_capacities = list(autotune_brick_capacities(
            np.asarray(sample["coords"]), np.asarray(sample["mask"]),
            num_levels=int(cfg.num_levels or 5), slack=1.5,
            brick_shape=brick_shape_of(cfg)))
        logger.info("autotuned brick capacities: %s (brick shape %s)",
                    cfg.brick_capacities, brick_shape_of(cfg))

    example = collate([train_ds[0]] * max(n_dev, 1))
    topo0 = build_topology(cfg, jnp.asarray(example["coords"]),
                           jnp.asarray(example["mask"]))
    state = create_train_state(model, topo0, jnp.asarray(example["in_feats"]),
                               tx, rng=jax.random.PRNGKey(
                                   int(cfg.manual_seed or 42)))
    if nproc > 1:
        # replicate onto the cross-process mesh: every process computed
        # the identical init (same seed/shapes), and the blessed route to
        # a global replicated array is the multihost assembly helper
        from jax.experimental import multihost_utils

        state = jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()) if hasattr(x, "shape") else x,
            state)
    else:
        rep = NamedSharding(mesh, P())
        state = jax.tree.map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
            state)

    start_epoch = int(cfg.start_epoch or 0)
    best_val = float("inf")
    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats, "opt_state": state.opt_state,
               "epoch": 0, "best_val": best_val}
    if cfg.resume:
        restored = restore_checkpoint(cfg.resume, payload)
        if restored is not None:
            state = state.replace(step=restored["step"],
                                  params=restored["params"],
                                  batch_stats=restored["batch_stats"],
                                  opt_state=restored["opt_state"])
            start_epoch = int(restored["epoch"]) + 1
            best_val = float(restored["best_val"])
            logger.info("resumed from %s @ epoch %d", cfg.resume, start_epoch)
        else:
            logger.warning("no checkpoint found at %s", cfg.resume)

    train_step = jax.jit(make_train_step(cfg), donate_argnums=0)
    eval_step = jax.jit(make_eval_step(cfg))
    clip_sim = make_clip_sim(cfg)

    def eval_forward(b):
        out, m = eval_step(state, to_batch(b, mesh))
        return out, m["distil_loss"]

    if nproc > 1:
        # grounding eval does host-side per-scene work on the forward's
        # output, which cannot read a cross-process global array. So each
        # process evaluates its own val shard on LOCAL devices with a
        # host copy of the replicated params, and the scalar metrics are
        # all-reduced afterwards — the reference's per-rank validate +
        # all_reduce (engine/distil.py:475-493).
        local_eval = jax.jit(make_eval_step(cfg))
        _pull = lambda x: jax.device_get(x.addressable_data(0)) \
            if isinstance(x, jax.Array) else x

        def _local_state(s, _cache={}):
            if _cache.get("id") != id(s):
                _cache["id"] = id(s)
                _cache["state"] = s.replace(
                    step=_pull(s.step),
                    params=jax.tree.map(_pull, s.params),
                    batch_stats=jax.tree.map(_pull, s.batch_stats),
                    opt_state=None)
            return _cache["state"]

        def eval_forward(b):  # noqa: F811 — multi-process override
            lb = DistilBatch(
                coords=jnp.asarray(b["coords"]),
                mask=jnp.asarray(b["mask"]),
                in_feats=jnp.asarray(b["in_feats"]),
                targets=jnp.asarray(b["targets"]),
                labels=jnp.asarray(np.asarray(b["labels"], np.int32)),
                labels_cls=jnp.asarray(np.asarray(
                    b.get("labels_cls", np.zeros_like(b["labels"])),
                    np.int32)))
            out, m = local_eval(_local_state(state), lb)
            return out, m["distil_loss"]

    dropout_key = jax.random.PRNGKey(int(cfg.manual_seed or 42) + 1)

    # Scanned trainer (VERDICT r4 #6): ``--opts scan_epochs N`` runs the
    # whole loop as lax.scan chunks of N epochs — one device dispatch per
    # chunk instead of one per optimizer step (through a tunneled device
    # the per-step dispatch was ~6x the MXU time of the r3 bench's
    # metrics loop). BOUNDARY: the dataset is pre-staged ONCE, so
    # per-epoch host-side re-draws (augmentation, random view selection,
    # MAX_POINTS resampling) are frozen at their start-epoch values —
    # datasets that rely on them must use the default per-step loop.
    # Eval + checkpointing happen at chunk boundaries (every N epochs).
    if int(cfg.scan_epochs or 0) > 0:
        _run_scanned(cfg, state, train_ds, val_loader, collate, mesh,
                     logger, save_dir, dropout_key, start_epoch,
                     eval_step=eval_step, clip_sim=clip_sim,
                     wandb_run=wandb_run, best_val=best_val)
        logger.info("done (scanned); checkpoints in %s", save_dir)
        return

    for epoch in range(start_epoch, int(cfg.epochs or 200)):
        train_loader.set_epoch(epoch)
        bt = AverageMeter("Batch", ":.3f")
        dt = AverageMeter("Data", ":.3f")
        lm = AverageMeter("DistilLoss", ":.4f")
        gm = AverageMeter("GradNorm", ":.2f")
        prog = ProgressMeter(iters_per_epoch, [bt, dt, lm, gm],
                             prefix=f"Epoch [{epoch}] ")
        epoch_dropped = 0  # capacity-overflow voxels (silent-truncation guard)
        end = time.time()
        for i, b in enumerate(train_loader):
            dt.update(time.time() - end)
            # on-demand profiling (SURVEY §5: the reference has only
            # wall-clock meters; here a real trace): profile_dir captures
            # steps 10..14 of the first epoch for xprof/tensorboard.
            if cfg.profile_dir and epoch == start_epoch and i == 10:
                jax.profiler.start_trace(cfg.profile_dir)
            dropout_key, sub = jax.random.split(dropout_key)
            state, metrics = train_step(state, to_batch(b, mesh), sub)
            # host fetch = sync point (also keeps meters honest)
            lm.update(float(metrics["distil_loss"]), n=int(cfg.batch_size or 8))
            gm.update(float(metrics["grad_norm"]))
            epoch_dropped += int(metrics.get("dropped_voxels", 0))
            bt.update(time.time() - end)
            end = time.time()
            if cfg.profile_dir and epoch == start_epoch and i == 14:
                jax.profiler.stop_trace()
                logger.info("profiler trace -> %s", cfg.profile_dir)
            if i % int(cfg.print_freq or 25) == 0:
                prog.display(i, print_fn=logger.info)
                if wandb_run is not None:
                    wandb_run.log({"train/distil_loss": lm.val,
                                   "train/grad_norm": gm.val,
                                   "train/step": int(state.step)})

        if epoch_dropped:
            logger.warning(
                "epoch %d: %d voxels/bricks dropped by brick-capacity "
                "overflow or grid extent — scenes are being truncated; "
                "raise brick_capacities/grid_bits or re-run the capacity "
                "autotune", epoch, epoch_dropped)
            if wandb_run is not None:
                wandb_run.log({"train/dropped_voxels": epoch_dropped})

        val_loss = lm.avg
        if val_loader is not None and (epoch % int(cfg.eval_freq or 1) == 0):
            if clip_sim is not None and cfg.eval_task in ("all", "segmentation") \
                    and cfg.cls_list_path:
                import json as _json

                from ..distill.evaluate import validate_segmentation

                cls_names = list(_json.load(open(cfg.cls_list_path)).values())
                cls_embs = clip_sim.encode_text(cls_names)
                seg_res = validate_segmentation(val_loader, eval_forward,
                                                cls_embs, cfg)
                if nproc > 1:
                    from ..core.mesh import all_reduce_mean_host

                    ks = sorted(seg_res)
                    seg_res = dict(zip(ks, np.asarray(all_reduce_mean_host(
                        [float(seg_res[k]) for k in ks])).tolist()))
                logger.info("Eval Segmentation: Epoch=[%d/%s] %s", epoch,
                            cfg.epochs, seg_res)
            if clip_sim is not None and cfg.eval_task in ("all", "grounding"):
                res = validate_grounding(val_loader, eval_forward, clip_sim,
                                         cfg)
                if nproc > 1:
                    # per-process shard metrics -> global mean (the
                    # reference's metric all_reduce; equal shards so
                    # mean-of-means is exact)
                    from ..core.mesh import all_reduce_mean_host

                    ks = sorted(res)
                    vs = np.asarray(all_reduce_mean_host(
                        [float(res[k]) for k in ks]))
                    res = dict(zip(ks, vs.tolist()))
                logger.info("Eval Grounding: Epoch=[%d/%s] %s", epoch,
                            cfg.epochs, res)
                val_loss = res["DistilLoss"]
                if wandb_run is not None:
                    wandb_run.log({"val_steps": epoch,
                                   **{f"validation/{k}": v
                                      for k, v in res.items()}})
            else:
                losses = [float(eval_forward(b)[1]) for b in val_loader]
                val_loss = float(np.mean(losses)) if losses else lm.avg
                if nproc > 1:
                    from ..core.mesh import all_reduce_mean_host

                    val_loss = float(np.asarray(
                        all_reduce_mean_host([val_loss]))[0])
                logger.info("Eval: Epoch=[%d/%s] DistilLoss=%.4f", epoch,
                            cfg.epochs, val_loss)
            if cfg.visualize:
                vdir = dump_visualization(
                    val_ds, collate, eval_forward, epoch, save_dir, cfg,
                    local_bs=max(int(cfg.batch_size_val or 8) // nproc, 1))
                logger.info("visualization -> %s", vdir)

        if epoch % int(cfg.save_freq or 1) == 0:
            # val_loss is globally reduced above, so is_best is identical
            # on every process — a rank-divergent `best` would turn the
            # best-checkpoint save into a mismatched orbax collective
            is_best = val_loss < best_val
            best_val = min(val_loss, best_val)
            # ALL processes must call save — orbax syncs internally and
            # only process 0 writes; a rank-0-only call deadlocks
            # multi-host runs (caught by tests/test_distributed.py)
            save_checkpoint(save_dir, {
                "step": state.step, "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": epoch,
                "best_val": best_val}, best=is_best)
            if jax.process_index() == 0:
                logger.info("saved checkpoint (epoch %d, best=%s)", epoch,
                            is_best)

    logger.info("done; checkpoints in %s", save_dir)


if __name__ == "__main__":
    main()
