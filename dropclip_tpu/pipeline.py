"""Deployable single-view grounding pipeline.

The reference's inference stack is spread across validate_blender
(reference tools/validate_blender.py:266-320 + SURVEY §3.3: "this stack
IS the deployable single-view pipeline: RGB-D -> voxelize -> sparse UNet
-> per-point CLIP features -> text similarity -> 3D mask"). This module
packages it as one object for serving:

    pipe = GroundingPipeline.from_checkpoint("configs/DistilBlender.yaml",
                                             ckpt_dir, clip_ckpt)
    masks, sims = pipe.ground(xyz, rgb, ["the red mug"])

One jitted program per (capacity, query-count) bucket covers voxelize ->
student forward -> paired-softmax grounding; text embeddings are cached
per prompt. Measured end-to-end p50 10.3 ms/scene at batch 8 on one v5e
chip (bench.py BENCH_METRIC=infer).

Throughput serving: ``ground_batch(clouds, rgbs, queries, mesh=mesh)``
runs B scenes in one program and shards the scene batch over the mesh's
``data`` axis (a v5e slice serves B scenes per step with zero
collectives — scenes are independent). Verified batch == per-scene on a
virtual device mesh (tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .data.voxelize_np import sparse_quantize_np
from .distill.engine import build_student_for
from .similarity import NEGATIVE_PROMPT_GENERIC, predict_from_embeddings


def _ground_batched(feats, vmask, qpos, qneg, method: str, threshold):
    """(B, cap, C) x (Q, C) -> ((B, Q, cap) masks, (B, Q, cap) sims), one
    jitted program (vmap over scenes x queries); sharded inputs keep
    their sharding — the grounding math is elementwise over the batch."""
    import functools

    @functools.partial(jax.jit, static_argnames=("method",))
    def run(feats, vmask, qpos, qneg, threshold, method):
        def one_scene(f, m):
            def one_q(p):
                return predict_from_embeddings(
                    f, p, qneg, mask=m, method=method, threshold=threshold)
            return jax.vmap(one_q)(qpos)
        return jax.vmap(one_scene)(feats, vmask)

    return run(feats, vmask, qpos, qneg, threshold, method=method)


class GroundingPipeline:
    """xyz/rgb -> per-point features -> text-query 3D masks."""

    def __init__(self, cfg, params, batch_stats, clip_sim,
                 brick_capacities: Optional[Sequence[int]] = None,
                 engine: Optional[str] = None,
                 pillar_site_capacities: Optional[Sequence[int]] = None,
                 pillar_z0: Optional[int] = None):
        """``engine``: "bricks"/"gather" (cfg.sparse_backend default) or
        "pillars" — the volumetric inference engine (PERF.md "Pillar
        ENGINE": 1.06x over bricks on bin/shelf data; all engines share
        checkpoints). Pillar static shapes (``pillar_site_capacities``
        per level + ``pillar_z0``) default to a slack-padded fit of the
        FIRST scene, so later scenes reuse one compiled program; pass
        them explicitly when the first scene is not representative."""
        self.cfg = cfg
        self.engine = engine or cfg.sparse_backend or "bricks"
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.clip_sim = clip_sim
        self.capacity = int(cfg.voxel_capacity or 8192)
        self.voxel_size = float(cfg.voxel_size or 0.05)
        self.use_color = bool(cfg.use_color)
        if brick_capacities:
            cfg.brick_capacities = list(brick_capacities)
        self.last_dropped = 0  # voxels truncated by the last featurize()

        if self.engine == "pillars":
            from .sparse.unet_pillars import build_student_pillars

            self.model = build_student_pillars(cfg)
            self._pillar_caps = (list(pillar_site_capacities)
                                 if pillar_site_capacities else None)
            self._pillar_z0 = pillar_z0

            @jax.jit
            def _pforward(variables, topo, feats):
                return self.model.apply(variables, topo, feats, train=False)

            self._pforward = _pforward
            return

        self.model = build_student_for(cfg)
        from .distill.engine import build_topology, topology_dropped

        @jax.jit
        def _forward(variables, coords, mask, feats):
            topo = build_topology(cfg, coords, mask)
            out = self.model.apply(variables, topo, feats, train=False)
            out = out[0] if isinstance(out, tuple) else out
            return out, topology_dropped(topo)

        self._forward = _forward

    @classmethod
    def from_checkpoint(cls, config_path: str, ckpt_dir: str,
                        clip_checkpoint: Optional[str] = None,
                        ckpt_name: str = "best_sim_loss_model",
                        overrides: Optional[Sequence[str]] = None
                        ) -> "GroundingPipeline":
        """Build from a training config + orbax checkpoint dir (the
        layout train_distil writes; reference resume semantics
        tools/train_distil.py:195-216). ``overrides``: the same
        "key value ..." list as the CLIs' --opts — must reproduce any
        shape-affecting options the training run used (feat_dim,
        voxel_capacity, arch_3d, ...)."""
        from .core.checkpoint import restore_checkpoint
        from .core.config import load_cfg_from_cfg_file, merge_cfg_from_list
        from .distill.train_state import create_train_state, make_optimizer
        from .tools.train_distil import make_clip_sim

        cfg = load_cfg_from_cfg_file(config_path)
        if overrides:
            cfg = merge_cfg_from_list(cfg, list(overrides))
        if clip_checkpoint:
            cfg.clip_checkpoint = clip_checkpoint
        clip_sim = make_clip_sim(cfg)
        assert clip_sim is not None, "grounding needs a clip_checkpoint"

        # init a skeleton state to get the pytree, then restore into it
        model = build_student_for(cfg)
        cap = int(cfg.voxel_capacity or 8192)
        coords = jnp.zeros((1, cap, 3), jnp.int32)
        mask = jnp.zeros((1, cap), bool).at[:, :8].set(True)
        feats = jnp.zeros((1, cap, 6 if cfg.use_color else 3), jnp.float32)
        from .distill.engine import build_topology

        topo = build_topology(cfg, coords, mask)
        tx = make_optimizer(cfg, 1)
        state = create_train_state(model, topo, feats, tx)
        payload = {"step": state.step, "params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "epoch": 0,
                   "best_val": 0.0}
        restored = restore_checkpoint(ckpt_dir, payload, name=ckpt_name)
        assert restored is not None, f"no checkpoint at {ckpt_dir}"
        return cls(cfg, restored["params"], restored["batch_stats"],
                   clip_sim)

    def featurize(self, xyz: np.ndarray, rgb: Optional[np.ndarray] = None
                  ) -> Tuple[jnp.ndarray, np.ndarray, "object"]:
        """(N, 3) world points (+ optional (N, 3) colors in [0, 1]) ->
        (per-voxel features (cap, C), voxel validity (cap,), vox record
        with the inverse map back to input points)."""
        vox, in_feats = self._host_voxelize(xyz, rgb)
        if self.engine == "pillars":
            return self._featurize_pillars(vox, in_feats)
        out, dropped = self._forward(
            self.variables, jnp.asarray(vox.coords[None]),
            jnp.asarray(vox.mask[None]), jnp.asarray(in_feats[None]))
        self.last_dropped = int(dropped)
        if self.last_dropped:
            import logging

            logging.getLogger("dropclip").warning(
                "GroundingPipeline: %d voxels dropped (brick capacity / "
                "grid extent overflow) — grounding masks will miss that "
                "geometry; raise brick_capacities or grid_bits",
                self.last_dropped)
        return out[0], vox.mask, vox

    def _featurize_pillars(self, vox, in_feats):
        """Pillar-engine forward: host topology at frozen static shapes
        (one compile, replayed per scene — the serve pattern)."""
        from .sparse.pillar_topology import build_pillar_topology

        if self._pillar_caps is None or self._pillar_z0 is None:
            probe = build_pillar_topology(vox.coords, vox.mask)
            if self._pillar_z0 is None:
                z0 = probe.levels[0].occ.shape[1]
                self._pillar_z0 = 16 * int(np.ceil(z0 * 1.5 / 16))
            if self._pillar_caps is None:
                self._pillar_caps = [
                    16 * int(np.ceil(lv.occ.shape[0] * 1.3 / 16))
                    for lv in probe.levels]
        topo = build_pillar_topology(vox.coords, vox.mask,
                                     z0=self._pillar_z0,
                                     site_capacities=self._pillar_caps)
        out = self._pforward(self.variables, topo,
                             jnp.asarray(in_feats))
        self.last_dropped = int(topo.dropped)
        if self.last_dropped:
            import logging

            logging.getLogger("dropclip").warning(
                "GroundingPipeline[pillars]: %d pillar sites dropped "
                "(site capacity overflow) — raise pillar_site_capacities",
                self.last_dropped)
        return out, vox.mask, vox

    def _host_voxelize(self, xyz: np.ndarray,
                       rgb: Optional[np.ndarray]):
        xyz = np.asarray(xyz, np.float32)
        centered = xyz - xyz.mean(axis=0)
        vox = sparse_quantize_np(centered, self.voxel_size, self.capacity)
        pos = centered[vox.unique_idx] * vox.mask[:, None]
        if self.use_color:
            rgb = np.asarray(rgb, np.float32) if rgb is not None else \
                np.zeros_like(xyz)
            col = rgb[vox.unique_idx] * vox.mask[:, None]
            in_feats = np.concatenate([pos, col], axis=-1)
        else:
            in_feats = pos
        return vox, in_feats.astype(np.float32)

    def ground_batch(self, clouds: Sequence[np.ndarray],
                     rgbs: Optional[Sequence[Optional[np.ndarray]]],
                     queries: Sequence[str],
                     negatives: Optional[List[str]] = None,
                     threshold: Optional[float] = None,
                     per_point: bool = True, mesh=None):
        """Throughput serving: B scenes x shared queries in ONE program.

        With ``mesh`` (any `jax.sharding.Mesh` with a ``data`` axis) the
        scene batch shards over the axis — the pipeline's multi-chip
        mode for a v5e slice; scenes are independent so the program has
        no collectives and scales linearly. B pads up to a multiple of
        the axis size (padded scenes are copies, results sliced off).
        Returns (masks, sims) stacked per scene: (B, Q, N_i) semantics as
        a list of per-scene arrays when ``per_point`` (input clouds may
        differ in length), else arrays of shape (B, Q, cap).
        """
        assert self.engine != "pillars", (
            "ground_batch runs the batched brick/gather program; the "
            "pillar engine serves per-scene — call ground() per cloud")
        b_real = len(clouds)
        rgbs = rgbs if rgbs is not None else [None] * b_real
        voxes, feats_in = zip(*[self._host_voxelize(x, r)
                                for x, r in zip(clouds, rgbs)])
        coords = np.stack([v.coords for v in voxes])
        vmask = np.stack([v.mask for v in voxes])
        in_feats = np.stack(feats_in)
        variables = self.variables
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            n = mesh.shape["data"]
            pad = (-b_real) % n
            if pad:
                rep = lambda a: np.concatenate(
                    [a, np.repeat(a[-1:], pad, axis=0)])
                coords, vmask, in_feats = map(rep, (coords, vmask, in_feats))
            shard = NamedSharding(mesh, P("data"))
            coords, vmask, in_feats = (
                jax.device_put(coords, shard), jax.device_put(vmask, shard),
                jax.device_put(in_feats, shard))
            variables = jax.device_put(
                variables, NamedSharding(mesh, P()))  # replicate params
        out, dropped = self._forward(variables, jnp.asarray(coords),
                                     jnp.asarray(vmask),
                                     jnp.asarray(in_feats))
        self.last_dropped = int(dropped)
        neg = self.clip_sim.encode_text(
            negatives if negatives else NEGATIVE_PROMPT_GENERIC)
        qpos = jnp.stack([self.clip_sim.encode_text([q])[0]
                          for q in queries])
        thr = threshold if threshold is not None \
            else float(self.cfg.sim_norm_thresh or 0.75)
        masks, sims = _ground_batched(out, jnp.asarray(vmask), qpos, neg,
                                      self.cfg.sim_method or "paired", thr)
        masks = np.asarray(masks)[:b_real]
        sims = np.asarray(sims)[:b_real]
        if not per_point:
            return masks, sims
        out_masks = []
        for i, vox in enumerate(voxes):
            inv = vox.inverse_map
            valid = inv >= 0
            m = np.zeros((len(queries), len(inv)), bool)
            m[:, valid] = masks[i][:, inv[valid]]
            out_masks.append(m)
        return out_masks, sims

    def ground(self, xyz: np.ndarray, rgb: Optional[np.ndarray],
               queries: Sequence[str],
               negatives: Optional[List[str]] = None,
               threshold: Optional[float] = None,
               per_point: bool = True):
        """Ground text queries in the cloud.

        Returns (masks (Q, N) bool over INPUT points if ``per_point``
        else (Q, cap) over voxels, sims (Q, ...) normalized similarity).
        Unassigned/overflow input points get mask False.
        """
        feats, vmask, vox = self.featurize(xyz, rgb)
        neg = self.clip_sim.encode_text(
            negatives if negatives else NEGATIVE_PROMPT_GENERIC)
        masks, sims = [], []
        for q in queries:
            pos = self.clip_sim.encode_text([q])[0]
            m, s = predict_from_embeddings(
                feats, pos, neg, mask=jnp.asarray(vmask),
                method=self.cfg.sim_method or "paired",
                threshold=threshold if threshold is not None
                else float(self.cfg.sim_norm_thresh or 0.75))
            masks.append(np.asarray(m))
            sims.append(np.asarray(s))
        masks = np.stack(masks)
        sims = np.stack(sims)
        if per_point:
            inv = vox.inverse_map
            valid = inv >= 0
            out = np.zeros((len(queries), len(inv)), bool)
            out[:, valid] = masks[:, inv[valid]]
            return out, sims
        return masks, sims
