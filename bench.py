"""Benchmark harness — prints ONE JSON line for the driver.

With BENCH_METRIC unset, ALL modes below run and one combined JSON line
is emitted (lead metric = fused scenes/sec, plus infer p50, train
throughput, and the synthetic e2e val mIoU/Pr@k — the three BASELINE.md
headline metrics from one invocation). The combined run executes
``metrics, infer, train, ingest_scaling, fusion`` IN THAT ORDER under a
global deadline (``BENCH_TOTAL_BUDGET``, default 1650 s — sized to the
driver's observed ~1800 s window): cheap headline modes first, fusion
(whose cold-compile worst case is ~1400 s) last, each mode's watchdog
derived from the remaining deadline. BENCH_METRIC selects a single
mode: ``fusion`` | ``infer`` | ``train`` | ``metrics`` |
``ingest_scaling`` (the last also runs in the combined default, on
virtual CPU devices, under its own BENCH_SCALING_TIMEOUT budget).

Modes:

- ``fusion`` (default — the BASELINE.json headline, ">10x fused
  scenes/sec vs the CUDA+MinkowskiEngine reference"): the full offline
  ingest of one MV-TOD-scale scene — 73-view RGB-D aggregation + voxel
  downsample, per-(view, object) CLIP ViT-L/14@336px crop-mask visual
  prompting + forwards, text queries, object-level fusion — steady-state
  scenes/sec ON ONE CHIP. Teacher weights are random (numerics don't
  change the compute).

- ``infer``: single-view END-TO-END inference per BASELINE.md's pinned
  definition — brick topology + MinkUNet14D forward to 768-d features +
  paired-softmax text-query grounding (8 queries x 8 negatives each) at
  deployment shapes (batch 8, 8192-voxel capacity, bf16), fully
  on-device; also prints the p50 per-scene latency. Estimated reference:
  40 scenes/sec (MinkowskiEngine on a modern GPU).

- ``train``: full distillation train-step throughput at recipe shapes
  (batch 8, MinkUNet14D, bf16, autotuned brick capacities).

- ``metrics``: the synthetic end-to-end train->validate loop — val
  mIoU / Pr@k plus the fusion upper bound (BASELINE.md's third headline
  metric; a loop-correctness number until real data/checkpoints exist).

The reference publishes no numbers (BASELINE.md). The fusion denominator
is derived bottom-up (FLOP/bandwidth arithmetic vs named GPUs) in
BASELINE_DERIVATION.md; the infer denominator remains a documented
estimate.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from dropclip_tpu.core.platform import honor_jax_platforms_env

honor_jax_platforms_env()

# fusion: derived bottom-up in BASELINE_DERIVATION.md — the reference
# ingest's sequential protocol costs ~20-35 s/scene on the 3090-class
# hardware it targets (580-880 ViT-L crop forwards = 260-400 TFLOP +
# 13-30 s single-threaded CPU aggregation/prompting/IO); 0.04 scenes/sec
# is the midpoint. The BASELINE.json ">10x" target is against a v5e-8
# slice; scenes are independent, so 8-chip ingest multiplies the
# single-chip number here. See BASELINE_DERIVATION.md for the
# saturated-throughput comparisons (8 loader processes per GPU).
EST_BASELINE = {"fusion": 0.04, "infer": 40.0}


def main_infer():
    import jax
    import jax.numpy as jnp

    from dropclip_tpu.similarity import predict_from_embeddings
    from dropclip_tpu.sparse.bricks import build_brick_topology
    from dropclip_tpu.sparse.unet import UNET_ARCHS
    from dropclip_tpu.sparse.unet_bricks import MinkUNetBricks

    block, layers, planes = UNET_ARCHS["MinkUNet14D"]
    model = MinkUNetBricks(out_channels=768, block=block, layers=layers,
                           planes=planes)

    # BENCH_SMOKE=1: tiny shapes for a CPU logic check (not a benchmark).
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    b, m = (2, 256) if smoke else (8, 8192)
    rng = np.random.RandomState(0)
    # surface-like scenes: table plane + object shells (matches the brick
    # clustering of real MV-TOD clouds). n_occ ~ MAX_POINTS=10000 after
    # voxel dedup; ext ~ tabletop ±40 voxels at 5 cm (SURVEY §6)
    from dropclip_tpu.data.synthetic import make_tabletop_coords
    coords_np, mask_np = make_tabletop_coords(
        rng, b, m, n_occ=128 if smoke else 6000, ext=8 if smoke else 40)
    coords = jnp.asarray(coords_np)
    mask = jnp.asarray(mask_np)
    feats = (jnp.asarray(rng.randn(b, m, 6).astype(np.float32))
             * mask[..., None]).astype(jnp.bfloat16)

    # one-time static setup from the data (deployment setup step:
    # capacities and brick shape are compile-time constants). The default
    # M//8 heuristic over-allocates ~25-30% on real surface scenes and
    # every brick conv scales with capacity; (4, 4, 2) bricks double
    # z-thin tabletop occupancy (1.6x full-forward, PERF.md) — same
    # choices the canonical configs make.
    from dropclip_tpu.sparse.bricks import autotune_brick_capacities
    bshape = (4, 4, 2)
    caps = autotune_brick_capacities(np.asarray(coords), np.asarray(mask),
                                     brick_shape=bshape)

    topo0 = build_brick_topology(coords, mask, brick_capacities=caps,
                                 brick_shape=bshape)
    variables = jax.jit(
        lambda t, f: model.init(jax.random.PRNGKey(0), t, f, train=False)
    )(topo0, feats)

    # Params as an argument, not a closure constant (compile-time blowup).
    # The jitted step CHAINS several forwards with a data dependency and
    # returns a scalar checksum: fetching it to host is the only reliable
    # sync point (on tunneled TPU runtimes block_until_ready can ack
    # before execution finishes), and chaining amortizes the host-fetch
    # round trip out of the per-forward time.
    reps = 1 if smoke else 5

    # grounding queries (BASELINE.md pins "end-to-end incl. text-query
    # similarity"): 8 queries x 8 negatives per scene, paired softmax
    nq, nneg = 8, 8
    c_out = 768
    qpos = jnp.asarray(rng.randn(nq, c_out).astype(np.float32))
    qpos = qpos / jnp.linalg.norm(qpos, axis=-1, keepdims=True)
    qneg = jnp.asarray(rng.randn(nq, nneg, c_out).astype(np.float32))
    qneg = qneg / jnp.linalg.norm(qneg, axis=-1, keepdims=True)

    @jax.jit
    def forward(variables, coords, mask, feats, qpos, qneg):
        def body(carry, _):
            f, acc = carry
            topo = build_brick_topology(coords, mask, brick_capacities=caps,
                                        brick_shape=bshape)
            out = model.apply(variables, topo, f, train=False)

            def ground_scene(feats_s, mask_s):
                def one_q(pos, negs):
                    pred, sims = predict_from_embeddings(
                        feats_s, pos, negs, mask=mask_s, method="paired",
                        threshold=0.75)
                    return pred.astype(jnp.float32).sum() + sims.sum()

                return jax.vmap(one_q)(qpos, qneg).sum()

            s = (jnp.sum(out.astype(jnp.float32))
                 + jax.vmap(ground_scene)(out, mask).sum())
            # data dependency between reps (prevents CSE/elision)
            return (f + (s * 1e-30).astype(f.dtype), acc + s), None

        (_, acc), _ = jax.lax.scan(body, (feats, jnp.float32(0.0)), None,
                                   length=reps)
        return acc

    # compile + warmup (host fetch forces full execution)
    float(forward(variables, coords, mask, feats, qpos, qneg))
    float(forward(variables, coords, mask, feats, qpos, qneg))

    iters = 3 if smoke else 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(forward(variables, coords, mask, feats, qpos, qneg))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times)) / reps
    scenes_per_sec = b / p50
    print(f"# p50 end-to-end (topology + UNet + {nq}-query grounding): "
          f"{1e3 * p50 / b:.1f} ms/scene at batch {b}")

    return {
        "metric": "single_view_infer_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / EST_BASELINE["infer"], 3),
        "p50_ms": round(1e3 * p50 / b, 2),
    }


def main_fusion():
    """Full ingest throughput at MV-TOD scale (the >10x headline)."""
    import jax.numpy as jnp

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.data.synthetic import make_raw_scene
    from dropclip_tpu.tools.preprocess_data import build_extractor, process_scene

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    n_views = 4 if smoke else 73
    n_objects = 3 if smoke else 10
    hw = (48, 64) if smoke else (480, 640)
    # scene 0: compile warmup. scene 1: sync_timings phase capture (the
    # per-round phase audit). scenes 2..: production async-tail pipeline
    # (fetch+compaction+write overlap the next scene's compute) — the
    # THROUGHPUT scenes. BENCH_FUSION_SCENES: the orchestrator trims the
    # steady tail when the global deadline is thin.
    n_scenes = 3 if smoke else max(
        3, int(os.environ.get("BENCH_FUSION_SCENES", 6)))
    n_phase = 2

    args = CfgNode(dict(
        clip_model="tiny-test" if smoke else "ViT-L/14@336px",
        clip_checkpoint=None, visual_prompt="crop-mask", crop_num_levels=1,
        crop_expansion_ratio=0.15, batch_size=32))
    extractor = build_extractor(args)

    rng = np.random.default_rng(0)
    scenes = [make_raw_scene(rng, n_objects=n_objects,
                             n_points_per_obj=400 if not smoke else 120,
                             n_views=n_views, hw=hw) for _ in range(n_scenes)]
    if not smoke:
        # MV-TOD intrinsics/scale (reference data/blender.py:180-187)
        for s in scenes:
            s["K"] = np.array([[444.44, 0, 319.5], [0, 444.44, 239.5],
                               [0, 0, 1]], np.float32)

    # production pipelining (as run_blender does): scene i+1's host->device
    # transfer is issued before scene i's compute, so the link rides under
    # the ViT work instead of serializing with it
    from dropclip_tpu.tools.preprocess_data import stage_scene

    staged = [stage_scene(s["images"], s["depths"], s["segs"], s["poses"],
                          s["K"]) for s in scenes[:1]]
    from dropclip_tpu.tools.preprocess_data import SceneWriter

    # bounded one-slot writer (run_blender's production pipeline): the h5
    # write overlaps the next scene's compute, but each submit joins the
    # previous write, so slow writes show up IN the per-scene times
    # instead of backing up in an unbounded queue outside the clock
    writer = SceneWriter()
    times, sync_walls = [], []
    phases = {"stage": [], "agg": [], "teacher": [], "fuse": [],
              "finalize": []}
    for i, s in enumerate(scenes):
        sync = i < n_phase  # phase-audit scenes; the rest run the
        # production async-tail pipeline and set the throughput number
        t0 = time.perf_counter()
        if i + 1 < len(scenes):
            n = scenes[i + 1]
            staged.append(stage_scene(n["images"], n["depths"], n["segs"],
                                      n["poses"], n["K"]))
        t_stage = time.perf_counter() - t0
        stats = process_scene(
            images=s["images"], depths=s["depths"], segs=s["segs"],
            poses=s["poses"], K=s["K"], obj_info=s["objects_info"],
            extractor=extractor, out_path=f"/tmp/bench_fusion/{i:04d}.h5py",
            voxel_size=0.01 if smoke else 0.005,
            cloud_capacity=4096 if smoke else 131072, staged=staged[i],
            writer=writer, sync_timings=sync)
        if sync and i > 0:  # scene 0 is compile warmup
            phases["stage"].append(t_stage)
            phases["agg"].append(stats["t_aggregate"])
            phases["teacher"].append(stats["t_teacher"])
            phases["fuse"].append(stats["t_fuse"])
            phases["finalize"].append(stats["t_finalize"])
            sync_walls.append(time.perf_counter() - t0)
        if not sync:
            times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    writer.close()
    drain = time.perf_counter() - t0
    # steady-state rate over the ASYNC scenes INCLUDING the final
    # write/fetch drain — the sustainable pipeline rate
    scenes_per_sec = len(times) / (float(np.sum(times)) + drain)
    # Phase audit (VERDICT r2 #2c / r3 #3): every key comes from ONE
    # regime so the books balance. Phase means + "other" are measured on
    # the SYNCED scenes (other = that same scene's wall minus its phase
    # sum: dispatch gaps, writer joins, host-link residue — >= 0 by
    # construction, modulo clock noise). The async pipeline's win over
    # the synced regime is the separate, also-non-negative "overlap" key:
    # sync wall - async wall = the finalize/fetch time the async tail
    # hides under the next scene's compute.
    ph = {k: float(np.mean(v)) for k, v in phases.items()}
    drain_amort = drain / max(len(times), 1)
    sync_wall = float(np.mean(sync_walls)) if sync_walls else 0.0
    async_wall = float(np.mean(times)) + drain_amort
    other = max(sync_wall - sum(ph.values()), 0.0)
    overlap = max(sync_wall - async_wall, 0.0)
    return {
        "metric": "fused_scenes_per_sec",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / EST_BASELINE["fusion"], 2),
        "agg_ms": round(1e3 * ph["agg"], 1),
        "teacher_ms": round(1e3 * ph["teacher"], 1),
        "fuse_ms": round(1e3 * ph["fuse"], 1),
        "finalize_ms": round(1e3 * ph["finalize"], 1),
        "stage_ms": round(1e3 * ph["stage"], 1),
        "other_ms": round(1e3 * other, 1),
        "sync_wall_ms": round(1e3 * sync_wall, 1),
        "overlap_ms": round(1e3 * overlap, 1),
        "async_wall_ms": round(1e3 * async_wall, 1),
        "write_drain_ms": round(1e3 * drain_amort, 1),
    }


def main_train():
    """Distillation train-step throughput (scenes/sec) at recipe shapes."""
    import jax
    import jax.numpy as jnp

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.distill.engine import (DistilBatch, build_student_for,
                                             build_topology, make_train_step)
    from dropclip_tpu.distill.train_state import (create_train_state,
                                                  make_optimizer)

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    b, m = (2, 256) if smoke else (8, 8192)
    cfg = CfgNode(dict(arch_3d="MinkUNet14A" if smoke else "MinkUNet14D",
                       feat_dim=16 if smoke else 768, loss_type="cosine",
                       base_lr=3e-4, min_lr=1e-4, epochs=200,
                       weight_decay=1e-5, max_norm=5.0,
                       brick_shape=[4, 4, 2], remat=False))
    rng = np.random.RandomState(0)
    ext = 8 if smoke else 40
    coords_list, mask_list = [], []
    n_occ = 128 if smoke else 6000
    for _ in range(b):
        xy = rng.randint(-ext, ext, size=(3 * n_occ, 2))
        z = rng.randint(0, 2, size=(3 * n_occ, 1))
        pts = np.concatenate([xy, z], axis=1).astype(np.int32)
        uniq = np.unique(pts, axis=0)[:n_occ]
        c = np.zeros((m, 3), np.int32)
        c[: len(uniq)] = uniq
        k = np.zeros((m,), bool)
        k[: len(uniq)] = True
        coords_list.append(c)
        mask_list.append(k)
    coords = jnp.asarray(np.stack(coords_list))
    mask = jnp.asarray(np.stack(mask_list))
    # bf16 activations = the TPU analogue of the reference's AMP fp16
    # recipe (tools/train_distil.py:136); loss/BN stats stay f32 inside
    feats = (jnp.asarray(rng.randn(b, m, 6).astype(np.float32))
             * mask[..., None]).astype(jnp.bfloat16)
    targets = jnp.asarray(
        rng.randn(b, m, int(cfg.feat_dim)).astype(np.float32)) * mask[..., None]
    labels = jnp.zeros((b, m), jnp.int32)
    batch = DistilBatch(coords, mask, feats, targets, labels, labels)

    # same one-time capacity/shape autotune the trainer applies by default
    from dropclip_tpu.sparse.bricks import autotune_brick_capacities
    cfg.brick_capacities = list(autotune_brick_capacities(
        np.asarray(coords), np.asarray(mask), slack=1.5,
        brick_shape=(4, 4, 2)))

    model = build_student_for(cfg)
    topo = build_topology(cfg, coords, mask)
    tx = make_optimizer(cfg, 100)
    state = create_train_state(model, topo, feats, tx)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)

    state, metrics = step(state, batch)
    _ = float(metrics["distil_loss"])  # compile+sync
    iters = 3 if smoke else 15
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        _ = float(metrics["distil_loss"])
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    return {"metric": "train_scenes_per_sec", "value": round(b / p50, 2),
            "unit": "scenes/sec", "vs_baseline": round(b / p50 / 16.0, 3)}
    # reference train recipe: global batch 8 on DDP GPUs; ~16 scenes/sec
    # is a generous single-GPU MinkowskiEngine estimate


def main_metrics():
    """Synthetic end-to-end train->validate loop: val mIoU / Pr@k.

    Per-object fused targets are the text embeddings of each object's
    class query under the SAME (tiny, random-weight) text encoder the
    grounding eval uses — so the fusion upper bound is ~perfect and the
    student's score measures the whole train->eval loop (SURVEY §6's
    third BASELINE metric). A loop-correctness number, not reference
    parity (that needs real MV-TOD data + checkpoints)."""
    import shutil

    import jax
    import jax.numpy as jnp

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.data import build_dataset_for
    from dropclip_tpu.data.scene_io import write_scene
    from dropclip_tpu.data.synthetic import make_raw_scene
    from dropclip_tpu.distill.engine import (DistilBatch, build_student_for,
                                             build_topology, make_eval_step,
                                             make_scanned_train)
    from dropclip_tpu.distill.evaluate import validate_grounding
    from dropclip_tpu.distill.train_state import (create_train_state,
                                                  make_optimizer)
    from dropclip_tpu.similarity import ClipSimilarity
    from dropclip_tpu.teachers.clip import CLIP

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    dim = 32
    model_clip = CLIP(embed_dim=dim, image_resolution=32, vision_layers=1,
                      vision_width=32, vision_patch_size=16, vision_heads=2,
                      context_length=77, vocab_size=49408,
                      transformer_width=32, transformer_heads=2,
                      transformer_layers=1)
    variables = jax.jit(
        lambda p, t: model_clip.init(jax.random.PRNGKey(0), p, t))(
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 77), jnp.int32))
    base_sim = ClipSimilarity(model_clip, variables, method="paired",
                              threshold=0.6)

    # Re-armed gate (VERDICT r4 #2): the r4 6-class/4-object recipe
    # saturated — Pr@25=Pr@50=Pr@75=100.0 on all 64 queries, so the gate
    # could no longer see regressions. Difficulty now comes from class
    # CONFUSABILITY, which is learnable headroom (a better recipe can
    # close it), not from unlearnable held-out classes: 12 classes whose
    # colors sit 30 deg apart on a hue wheel (alternating sat/value so
    # neighbors differ, but far less than r4's 6 maximally-spread RGB
    # anchors), 6 objects per scene (smaller masks -> boundary voxels
    # cost more IoU; 96 val queries at 16 scenes), and per-point color
    # noise (sigma 0.08) so thresholding a clean color can't solve it.
    import colorsys
    names = ["mug", "bowl", "can", "box", "bottle", "plate",
             "cup", "jar", "tray", "pot", "lid", "bin"]
    _CLASS_COLORS = {
        n: colorsys.hsv_to_rgb(i / len(names),
                               0.55 if i % 2 else 0.85,
                               0.85 if i % 3 else 0.6)
        for i, n in enumerate(names)}
    _COLOR_NOISE = 0.08

    class _WhitenedSim:
        """Text encoder whitened on the class anchors. A RANDOM-weight
        CLIP maps every prompt near one mean direction (pairwise cos
        ~0.9+), so a converged-but-imperfect student can't separate
        classes — an artifact of random weights, not of the loop this
        mode measures. Whitening (applied identically to targets and
        eval queries, so consistency is preserved) restores the
        separability real CLIP text embeddings have."""

        def __init__(self, base, anchors):
            self.base = base
            e = np.asarray(base.encode_text(anchors), np.float64)
            _, s, vt = np.linalg.svd(e, full_matrices=False)
            self._w = (vt.T / s) @ vt  # (C, C): anchors -> orthonormal
            self._cache = {}  # prompts are 7 fixed strings, but the eval
            # loop re-encodes per query — each a device dispatch (a tunnel
            # round-trip); memoizing removes ~hundreds of them

        def encode_text(self, prompts):
            k = tuple(prompts)
            if k not in self._cache:
                e = np.asarray(self.base.encode_text(list(k)), np.float64)
                w = e @ self._w
                w /= np.linalg.norm(w, axis=-1, keepdims=True)
                self._cache[k] = jnp.asarray(w.astype(np.float32))
            return self._cache[k]

    clip_sim = _WhitenedSim(base_sim, ["table"] + names)

    # per-process root: two concurrent bench runs (driver + a user sweep)
    # sharing one path would rmtree each other's scenes mid-train
    root = f"/tmp/bench_metrics_ds_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    n_objects = 6
    # BENCH_METRICS_TRAIN_SCENES: recipe knob (val/train loss gap says
    # generalization — scene count is the lever). Each split draws from
    # its OWN fixed-seed rng so sweeping the train-scene count leaves
    # the val set bit-identical (a shared rng made the 8-vs-16 sweep
    # incomparable: the extra train draws shifted the test scenes, and
    # the fusion upper bound moved 97.2 -> 94.3). Default 64 is the r5
    # sweep winner ON THE RE-ARMED GATE (12 confusable classes, 6
    # objects/scene, color noise — see _CLASS_COLORS above; r4's gate
    # had saturated at Pr@k=100 on every tail metric and could no longer
    # detect regressions). r5 sweep, fixed 96-query val draw (table in
    # PERF.md): 32 -> 0.627x ub / Pr@75 34.4, 64 -> 0.889x / 76.0,
    # 128 -> saturation check. 64 keeps >= 10 points of headroom on
    # mIoU (82.5 vs ub 92.8) and Pr@75 (76.0 vs 94.8) so the gate can
    # move in BOTH directions.
    # 16 test scenes x 6 objects = 96 grounding queries: Pr@k resolves
    # in ~1% steps (VERDICT r2 #3 — a 16-query gate couldn't even see a
    # multi-point regression).
    n_train, n_test = (2, 1) if smoke else (
        int(os.environ.get("BENCH_METRICS_TRAIN_SCENES", 64)),
        int(os.environ.get("BENCH_METRICS_TEST_SCENES", 16)))
    for split, ns, rng in (("train", n_train, np.random.default_rng(0)),
                           ("test", n_test, np.random.default_rng(1))):
        for s in range(ns):
            raw = make_raw_scene(rng, n_objects=n_objects,
                                 n_points_per_obj=120, n_views=4)
            info = raw["objects_info"]
            order = rng.permutation(len(names))  # distinct classes per
            # scene: "cls" queries must be unambiguous for grounding
            for k in range(1, n_objects + 1):
                cls = names[int(order[k - 1])]
                info[k]["cls_name"] = cls
                # class determines color: make_raw_scene colors objects
                # RANDOMLY, so with permuted class names nothing in the
                # input predicts the target embedding and a converged
                # student still scores ~16% val mIoU (pure memorization
                # of the train scenes). A fixed class->color map makes
                # the distillation task learnable, so the student score
                # measures the train->eval loop, not an impossible task.
                # Per-point noise on top of the class color: the 30-deg
                # hue spacing plus noise is what re-arms the gate.
                sel = raw["labels"] == k
                raw["colors"][sel] = np.clip(
                    np.asarray(_CLASS_COLORS[cls])
                    + rng.normal(0, _COLOR_NOISE, (int(sel.sum()), 3)),
                    0.0, 1.0)
            texts = ["table"] + [info[k]["cls_name"]
                                 for k in range(1, n_objects + 1)]
            feats = np.asarray(clip_sim.encode_text(texts), np.float32)
            vis = np.ones((4, len(raw["points"])), bool)
            sid = f"{split}_{s:04d}"
            write_scene(os.path.join(root, split, sid, f"{sid}.h5py"),
                        xyz=raw["points"], rgb=raw["colors"],
                        label=raw["labels"], vis_mask=vis, obj_feats=feats,
                        objects_info=info)

    cfg = CfgNode(dict(
        dataset="DistilBlender", root_dir=root, use_full_pc=True,
        use_color=True, voxel_size=0.02, voxel_capacity=1024,
        eval_scenario="cls", sim_method="paired", sim_norm_thresh=0.6, evaluate=True,
        sim_negatives="scene", manual_seed=42,
        arch_3d="MinkUNet14D", feat_dim=dim, loss_type="cosine",
        planes=[8, 8, 16, 16, 16, 16, 8, 8], layers=[1] * 8, init_dim=8,
        # 200 epochs: +2.9 val mIoU over 100 on the fixed CPU seed
        # (77.7 -> 80.6, 0.80 -> 0.83x the fusion upper bound; val distil
        # loss 0.148 -> 0.091). Regularization knobs measured flat-to-
        # negative on this tiny-synthetic loop: aug -13 pts, wd 1e-4 +0.3,
        # dropout 0.1 -0.2, 2x width +0.5 (and 2x width at 200 epochs
        # -1.6 mIoU / +12.5 Pr@75 — width trades the headline for tails).
        # (Those sweeps used the old shared-rng splits and r4's
        # 6-far-color gate, which the 32-scene recipe saturated at
        # 0.993x ub / Pr@k 100 on every tail metric — hence the r5
        # re-arm above; current sweep table in PERF.md.)
        base_lr=1e-2, min_lr=1e-3,
        epochs=8 if smoke else int(os.environ.get("BENCH_METRICS_EPOCHS",
                                                  200)),
        weight_decay=1e-5, max_norm=5.0, remat=False,
        brick_shape=[4, 4, 2]))

    train_ds, val_ds, collate = build_dataset_for(cfg)
    bsz = 2 if smoke else 4

    from dropclip_tpu.sparse.bricks import autotune_brick_capacities
    sample = collate([train_ds[i % len(train_ds)] for i in range(8)])
    cfg.brick_capacities = list(autotune_brick_capacities(
        np.asarray(sample["coords"]), np.asarray(sample["mask"]), slack=1.5,
        brick_shape=(4, 4, 2)))

    def to_batch(b):
        z = np.zeros_like(b["labels"])
        return DistilBatch(
            coords=jnp.asarray(b["coords"]), mask=jnp.asarray(b["mask"]),
            in_feats=jnp.asarray(b["in_feats"]),
            targets=jnp.asarray(b["targets"]),
            labels=jnp.asarray(b["labels"]).astype(jnp.int32),
            labels_cls=jnp.asarray(z).astype(jnp.int32))

    def batches_of(ds, shuffle_rng=None):
        idx = np.arange(len(ds))
        if shuffle_rng is not None:
            shuffle_rng.shuffle(idx)
        idx = idx[: (len(idx) // bsz) * bsz] if len(idx) >= bsz else idx
        out = []
        for i in range(0, len(idx), bsz):
            chunk = [ds[int(j)] for j in idx[i:i + bsz]]
            while len(chunk) < bsz:
                chunk.append(chunk[-1])
            out.append(collate(chunk))
        return out

    model = build_student_for(cfg)
    ex = to_batch(batches_of(train_ds)[0])
    topo0 = build_topology(cfg, ex.coords, ex.mask)
    tx = make_optimizer(cfg, iters_per_epoch=max(len(train_ds) // bsz, 1))
    state = create_train_state(model, topo0, ex.in_feats, tx)
    eval_step = jax.jit(make_eval_step(cfg))

    # Scanned trainer (VERDICT r3 #2): the r3 loop paid one device
    # dispatch + host re-collate per optimizer step — through the axon
    # tunnel that was ~930 s of the driver budget with the MXU nearly
    # idle. ds[i] is deterministic here (set_epoch is never called), so
    # pre-staging the dataset once and gathering batches by index inside
    # lax.scan is bit-identical to re-collating per epoch (the schedule
    # below consumes srng exactly like batches_of did, and the scan body
    # runs the same jax.random.split chain) — the whole 200-epoch loop
    # becomes ~epochs/25 dispatches.
    data_all = to_batch(collate([train_ds[i] for i in range(len(train_ds))]))
    n, srng = len(train_ds), np.random.default_rng(1)
    sched = []
    for _ in range(int(cfg.epochs)):
        idx = np.arange(n)
        srng.shuffle(idx)
        idx = idx[: (n // bsz) * bsz] if n >= bsz else idx
        for i in range(0, len(idx), bsz):
            row = list(idx[i:i + bsz])
            while len(row) < bsz:
                row.append(row[-1])
            sched.append(row)
    sched = np.asarray(sched, np.int32)  # (total_steps, bsz)
    steps_per_epoch = max(len(sched) // int(cfg.epochs), 1)

    chunk_fn = jax.jit(make_scanned_train(cfg), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    rows_per_chunk = steps_per_epoch * 25
    for c0 in range(0, len(sched), rows_per_chunk):
        rows = sched[c0:c0 + rows_per_chunk]
        state, key, mstack = chunk_fn(state, data_all, jnp.asarray(rows), key)
        print(f"# metrics e2e: epoch {(c0 + len(rows)) // steps_per_epoch} "
              f"distil_loss "
              f"{float(np.asarray(mstack['distil_loss'])[-1]):.4f}",
              flush=True)

    val_batches = batches_of(val_ds)

    def student_forward(b):
        out, m = eval_step(state, to_batch(b))
        return out, m["distil_loss"]

    def upper_forward(b):
        return jnp.asarray(b["targets"]), 0.0

    res = validate_grounding(val_batches, student_forward, clip_sim, cfg)
    ub = validate_grounding(val_batches, upper_forward, clip_sim, cfg)
    print(f"# metrics e2e: student {res} | upper-bound {ub}", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    return {
        "metric": "val_miou", "value": round(res["mIoU"], 2), "unit": "%",
        # baseline for this synthetic loop = the fusion upper bound
        "vs_baseline": round(res["mIoU"] / max(ub["mIoU"], 1e-9), 3),
        "val_pr25": round(res["Pr@25"], 2), "val_pr50": round(res["Pr@50"], 2),
        "val_pr75": round(res["Pr@75"], 2),
        "upper_bound_miou": round(ub["mIoU"], 2),
        # tracked across rounds by name (VERDICT r2 #3): how much of the
        # fusion ceiling the distilled student recovers
        "student_over_upper_bound": round(
            res["mIoU"] / max(ub["mIoU"], 1e-9), 3),
        "n_queries": n_test * n_objects,
    }


def main_ingest_scaling_point():
    """One scaling datapoint: synthetic multi-device ingest at
    BENCH_SCALE_N workers (run by main_ingest_scaling in a subprocess
    with JAX_PLATFORMS=cpu + 8 forced host devices)."""
    import shutil

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.data.synthetic import make_raw_scene
    from dropclip_tpu.tools.preprocess_data import (_run_multidevice,
                                                    build_extractor,
                                                    stage_scene)

    n = int(os.environ["BENCH_SCALE_N"])
    # >= 6 scenes per worker: with fewer, the tail (each worker's last
    # scene draining alone) plus 1-core scheduler noise dominates the
    # efficiency number (measured 0.68-0.94 run-to-run at 3/worker vs
    # 0.96 at 6/worker for the same code)
    n_scenes = int(os.environ.get("BENCH_SCALE_SCENES", max(16, 6 * n)))
    args = CfgNode(dict(clip_model="tiny-test", clip_checkpoint=None,
                        visual_prompt="crop-mask", crop_num_levels=1,
                        crop_expansion_ratio=0.15, batch_size=32))
    extractor = build_extractor(args)
    root = f"/tmp/bench_scaling_{os.getpid()}"

    def make_load_one(outdir):
        def load_one(sid: int, device=None):
            scene_id = f"{sid:06d}"
            # per-scene rng: identical scenes regardless of worker count,
            # so every datapoint processes the same bytes. 8 views at
            # 120x160 keeps per-scene DEVICE compute dominant over the
            # GIL-held host residue (tokenizer, compaction, h5 submit) —
            # the production regime (73 views at 480x640); at toy 48x64
            # scenes the host share alone caps 8-worker efficiency ~0.75
            raw = make_raw_scene(np.random.default_rng(sid), n_objects=3,
                                 n_views=8, hw=(120, 160),
                                 n_points_per_obj=400)
            kw = dict(images=raw["images"], depths=raw["depths"],
                      segs=raw["segs"], poses=raw["poses"], K=raw["K"],
                      obj_info=raw["objects_info"],
                      out_path=os.path.join(outdir, f"{scene_id}.h5py"),
                      voxel_size=0.02, cloud_capacity=4096)
            if device is not None:
                kw["staged"] = stage_scene(kw["images"], kw["depths"],
                                           kw["segs"], kw["poses"],
                                           kw["K"], device=device)
            return (scene_id, kw)

        return load_one

    # warmup: one scene per worker device — each device's jit executables
    # compile outside the clock (the steady-state regime the claim covers)
    _run_multidevice(extractor, make_load_one(f"{root}/warm"), range(n), n)
    t0 = time.perf_counter()
    _run_multidevice(extractor, make_load_one(f"{root}/run"),
                     range(n_scenes), n)
    dt = time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    return {"metric": "ingest_scenes_per_sec", "value": round(n_scenes / dt, 3),
            "unit": "scenes/sec", "vs_baseline": 0.0, "n_devices": n,
            "n_scenes": n_scenes}


def main_ingest_scaling():
    """Multi-device ingest orchestration overhead (VERDICT r2 #7).

    Runs the synthetic --n-devices ingest at 1/2/4/8 workers on a virtual
    8-CPU-device mesh, one subprocess per point. This host has ONE core,
    so virtual devices share compute and aggregate scenes/sec CANNOT rise
    with n — what the sweep isolates is exactly the part the linear-
    scaling claim hasn't shown: whether the round-robin worker threads,
    per-device replicas, staging and writer joins SERIALIZE or add
    overhead. Efficiency(n) = sps(n)/sps(1): ~1.0 means the orchestration
    is work-conserving, so on real chips (each worker getting its own
    MXU) throughput scales with devices."""
    import subprocess
    import sys

    # per-point cost model from measured runs on this box (subprocess
    # spawn+import ~15-20 s, ~2-2.5 s/scene at the toy shapes, warmup =
    # n scenes): n=8 with its 48 scenes is the expensive point. The
    # per-point budget derives from THIS model and the remaining mode
    # budget — the old flat budget/9 starved n>=4 whenever the
    # orchestrator handed the mode less than its full cap (measured:
    # n=4 needs ~65 s, got 40 s, and the whole mode error'd out).
    # A SQUEEZED mode budget (earlier modes burned their retries) drops
    # the curve points: the efficiency headline needs exactly n=1 and
    # n=8, and a 4-point pass that starves n=8 to the 70 s floor fails
    # the whole mode (measured in the v6 validation run).
    mode_total = _mode_budget_s()
    order = (1, 2, 4, 8) if mode_total >= 500 else (1, 8)
    est_point = {n: 25 + 2.5 * (n + max(16, 6 * n)) for n in order}
    deadline = time.perf_counter() + mode_total * 0.92

    def run_point(n: int, budget: float):
        # single-thread eigen: each virtual device otherwise spins up its
        # own work-stealing pool whose BUSY-WAIT threads burn the host
        # core while holding no work — measured 0.36-0.96 sps run-to-run
        # chaos at n=8 with the pools, a stable 0.98-1.01 without
        env = dict(os.environ, BENCH_METRIC="ingest_scaling_point",
                   BENCH_SCALE_N=str(n), BENCH_NO_PROBE="1",
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                              " --xla_force_host_platform_device_count=8"
                              " --xla_cpu_multi_thread_eigen=false"))
        rc, parsed = _run_mode_subprocess(f"scale{n}", env, budget)
        if parsed is not None and "error" not in parsed:
            return float(parsed["value"])
        return 0.0

    points = {}
    # Pass 1 completes ALL points before any noise-filtering extras: a
    # second-trial reserve here starved mid-queue points whenever the
    # orchestrator handed this mode a squeezed budget (v6 validation:
    # n=4 at the 70 s floor needs ~76 s -> whole mode error'd).
    for i, n in enumerate(order):
        later = sum(est_point[m] for m in order[i + 1:])
        budget = min(est_point[n] * 2,
                     deadline - time.perf_counter() - later)
        best = run_point(n, max(budget, 70))
        if not best:
            # one immediate retry if the later points' reserve allows
            budget = deadline - time.perf_counter() - later
            if budget >= est_point[n]:
                best = run_point(n, budget)
        if not best:
            return {"metric": "ingest_scaling_efficiency", "value": 0.0,
                    "unit": "x", "vs_baseline": 0.0,
                    "error": f"point n={n} failed"}
        points[n] = best
        print(f"# ingest_scaling: n={n} -> {best} scenes/sec", flush=True)
        time.sleep(2)  # let the point's worker threads fully drain: the
        # next point measured ~25% slow when launched back-to-back
    # opportunistic extra trials: on one core the OS scheduler only ever
    # SLOWS a trial, never speeds it — max() filters that one-sided
    # noise, so extra trials move each point monotonically toward truth.
    # The headline is the RATIO p8/p1, so extras run in SYMMETRIC PAIRS
    # (n=8 then n=1) funded strictly by leftover budget: lifting only
    # the cheap denominator biased the ratio down (measured 0.998 ->
    # 0.929 when n=1 got two extras and n=8 none), lifting only the
    # numerator would flatter it.
    hi, lo = order[-1], order[0]
    pair_cost = (est_point[hi] + est_point[lo]) * 1.3
    for _pass in range(2):
        if deadline - time.perf_counter() < pair_cost:
            break
        for n in (hi, lo):
            v = run_point(n, est_point[n] * 1.3)
            if v > points[n]:
                print(f"# ingest_scaling: n={n} improved {points[n]} -> {v}",
                      flush=True)
                points[n] = v
    eff = {n: round(points[n] / max(points[1], 1e-9), 3) for n in points}
    return {"metric": "ingest_scaling_efficiency", "value": eff[8],
            "unit": "x", "vs_baseline": eff[8],
            "scenes_per_sec": points, "efficiency_vs_1worker": eff,
            "note": "1-core host: ideal is flat sps (eff ~1.0); "
                    "chips add compute on real hardware"}


def _arm_watchdog(emit, seconds: float):
    """Last-resort guard for a wedged TPU tunnel: a mode stuck inside a
    device dispatch can't be interrupted from Python, but a daemon thread
    can still flush a final JSON line and exit so the driver records the
    modes that DID complete instead of nothing. Returns an Event the
    caller sets on completion."""
    import threading

    done = threading.Event()

    def _fire():
        if not done.wait(seconds):
            emit()
            os._exit(0)

    threading.Thread(target=_fire, daemon=True).start()
    return done


def _mode_budget_s() -> float:
    # the longest mode (metrics: full synthetic train->validate e2e) runs
    # ~10 min on the chip; 30 min/mode only ever fires on a wedged tunnel
    return float(os.environ.get("BENCH_MODE_TIMEOUT", 1800))


def _on_cpu() -> bool:
    """True when this process is pinned to CPU. Config check only —
    initializing the axon client before knowing the tunnel is healthy is
    exactly the hang the probe exists to avoid."""
    import jax

    return jax.config.jax_platforms == "cpu"


def _probe_device(attempts: int, timeout_s: float, backoff_s: float) -> bool:
    """True if the TPU answers a tiny dispatch in a SUBPROCESS (a wedged
    dispatch cannot be interrupted in-process).

    Retries with backoff (VERDICT r2 #1): round 2 lost ALL device metrics
    to ONE failed probe, and this box has since measured a healthy-but-cold
    tunnel init at >120 s — one attempt cannot distinguish "wedged for
    hours" from "first init is slow today". Wedges have also been observed
    to clear, so callers re-probe between modes rather than latching the
    first failure."""
    import subprocess
    import sys

    for i in range(max(attempts, 1)):
        if i:
            print(f"# bench: probe backoff {backoff_s:.0f}s before retry "
                  f"{i + 1}/{attempts}", flush=True)
            time.sleep(backoff_s)
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax.numpy as jnp; print(float(jnp.arange(8).sum()))"],
                timeout=timeout_s, check=True, cwd=os.path.dirname(
                    os.path.abspath(__file__)) or ".",
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if i:
                print(f"# bench: device probe recovered on attempt {i + 1}",
                      flush=True)
            return True
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            print(f"# bench: device probe attempt {i + 1}/{attempts} failed "
                  f"({e.__class__.__name__}, {timeout_s:.0f}s budget)",
                  flush=True)
    return False


def _probe_params():
    return (int(os.environ.get("BENCH_PROBE_RETRIES", 4)),
            float(os.environ.get("BENCH_PROBE_TIMEOUT", 180)),
            float(os.environ.get("BENCH_PROBE_BACKOFF", 45)))


def _run_mode_subprocess(name: str, env: dict, budget_s: float):
    """Run one bench mode in its own process; return (rc, parsed_json).

    Process isolation is what makes a mid-run wedge survivable: a stuck
    device dispatch takes down only its mode's process, the orchestrator
    re-probes and the remaining modes still report. The child's own
    watchdog (BENCH_MODE_TIMEOUT) fires first and emits an error line; the
    parent's kill at budget+120 s is the backstop."""
    import signal
    import subprocess
    import sys

    child_env = dict(env, BENCH_MODE_TIMEOUT=str(budget_s))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=child_env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        start_new_session=True,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
    last_json = [None]

    def _pump():
        for line in proc.stdout:
            line = line.rstrip("\n")
            s = line.strip()
            if s.startswith("{"):
                try:
                    last_json[0] = json.loads(s)
                except ValueError:
                    pass
            print(f"# [{name}] {line}", flush=True)

    import threading

    t = threading.Thread(target=_pump, daemon=True)
    t.start()
    try:
        rc = proc.wait(timeout=budget_s + 120)
    except subprocess.TimeoutExpired:
        print(f"# bench: mode '{name}' exceeded parent budget — killing its "
              "process group", flush=True)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            proc.kill()
        proc.wait()
        rc = -9
    t.join(timeout=10)
    return rc, last_json[0]


MODE_FNS = {"fusion": lambda: main_fusion(),
            "infer": lambda: main_infer(),
            "train": lambda: main_train(),
            "metrics": lambda: main_metrics(),
            "ingest_scaling": lambda: main_ingest_scaling(),
            "ingest_scaling_point": lambda: main_ingest_scaling_point()}

# metric name per mode: a timed-out train run must not record a bogus
# fusion=0.0 datapoint
METRIC_NAMES = {"fusion": ("fused_scenes_per_sec", "scenes/sec"),
                "infer": ("single_view_infer_scenes_per_sec", "scenes/sec"),
                "train": ("train_scenes_per_sec", "scenes/sec"),
                "metrics": ("val_miou", "%"),
                "ingest_scaling": ("ingest_scaling_efficiency", "x")}


def main_single(mode: str):
    """Child path: run ONE mode in this process, print its JSON line.

    Probes the device first unless the orchestrator already did
    (BENCH_NO_PROBE=1). The in-process watchdog flushes an error line and
    exits if the mode wedges mid-dispatch."""
    if not os.environ.get("BENCH_NO_PROBE") and not _on_cpu() \
            and mode != "ingest_scaling_point":
        if not _probe_device(*_probe_params()):
            if mode == "metrics":
                # quality metric — valid on any backend; re-exec pinned
                # to CPU (jax platform must be set before client init)
                import sys

                env = dict(os.environ, JAX_PLATFORMS="cpu",
                           BENCH_NO_PROBE="1")
                os.execve(sys.executable,
                          [sys.executable, os.path.abspath(__file__)], env)
            m_name, m_unit = METRIC_NAMES.get(mode, (mode, ""))
            print(json.dumps({"metric": m_name, "value": 0.0,
                              "unit": m_unit, "vs_baseline": 0.0,
                              "error": "device wedged; no CPU fallback for "
                                       "device-speed modes"}), flush=True)
            return
    m_name, m_unit = METRIC_NAMES.get(mode, (mode, ""))
    done = _arm_watchdog(
        lambda: print(json.dumps(
            {"metric": m_name, "value": 0.0, "unit": m_unit,
             "vs_baseline": 0.0,
             "error": f"mode '{mode}' timed out (wedged device?)"}),
            flush=True), _mode_budget_s())
    line = json.dumps(MODE_FNS[mode]())
    done.set()
    print(line, flush=True)


def main_combined():
    """Orchestrator: every headline mode in its OWN subprocess, one
    combined JSON line re-printed after each (fusion is the lead metric —
    BASELINE.json's ">10x fused scenes/sec").

    Budget policy (VERDICT r4 #1 — the r4 driver run hit rc=124 with only
    one mode recorded): a GLOBAL deadline (BENCH_TOTAL_BUDGET) sized to
    the driver's observed window, from which each mode's subprocess
    watchdog is derived as min(mode cap, remaining - reserve for the
    later modes). Cheap round-headline modes run FIRST (infer/train at
    ~1-2 min each, then the ~5-8 min metrics gate — whose budget frees
    up as soon as the cheap modes finish under their estimates, and
    which gets ONE retry with the leftover budget if a slow tunnel
    times it out); fusion runs LAST because its cold-compile worst case
    (~1400 s of ViT-L crop-shape compiles on the tunnel; ~120 s warm
    via the persistent .jax_cache) is the one cost that can eat
    everything.

    Wedge policy (VERDICT r2 #1 + r4 #7 probe hygiene): START
    OPTIMISTICALLY — no up-front probe (a healthy run pays 0 s of probe;
    r4 paid 225 s before the first mode). Each child runs under its own
    watchdog, so a wedged tunnel costs at most the first mode's budget;
    after any device-mode failure, probe with retries+backoff before each
    remaining device mode — wedges have been observed to clear mid-run,
    and round 2 lost every device metric by latching one failed probe.
    The metrics mode is quality-only and falls back to CPU (including a
    CPU re-run if its first, optimistic device attempt wedged)."""
    modes = ["infer", "train", "metrics", "ingest_scaling", "fusion"]
    # per-mode warm-path cost estimates (s) used to reserve deadline for
    # later modes, and hard caps so one mode can't starve the rest even
    # when the remaining budget is large. Measured warm costs on the
    # chip (r5): infer 54 s, train ~100 s, metrics 290-450 s (the tunnel
    # adds up to ~1.5x run-to-run), fusion 120 s warm / ~1400 s cold.
    # infer/train run first: cheapest, most reliable, and they free
    # metrics' budget from their reserve the moment they finish.
    # ests are LEAN medians, not upper bounds: they only reserve budget
    # for later modes, and an est sum close to the total budget starves
    # the FIRST modes down to the 120 s floor (measured: infer, a 54 s
    # mode, watchdogged at a 170 s budget when the ests summed to 1600
    # of a 1650 budget). Slow-tunnel overruns are handled by the
    # one-retry-with-leftover-budget path, not by fat reserves.
    est = {"metrics": 420, "infer": 90, "train": 220,
           "ingest_scaling": 400, "fusion": 250}
    cap = {"metrics": 650, "infer": 300, "train": 450,
           "ingest_scaling": 720, "fusion": 1800}
    t_start = time.perf_counter()
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", 1650))
    results, errors = {}, {}
    on_cpu = _on_cpu()
    healthy = True  # optimistic until a device mode fails

    extra_keys = {
        "fusion": {"fused_scenes_per_sec": "value",
                   "vs_baseline_fusion": "vs_baseline",
                   "ingest_agg_ms": "agg_ms",
                   "ingest_teacher_ms": "teacher_ms",
                   "ingest_fuse_ms": "fuse_ms",
                   "ingest_finalize_ms": "finalize_ms",
                   "ingest_stage_ms": "stage_ms",
                   "ingest_other_ms": "other_ms",
                   "ingest_sync_wall_ms": "sync_wall_ms",
                   "ingest_overlap_ms": "overlap_ms",
                   "ingest_async_wall_ms": "async_wall_ms"},
        "infer": {"infer_scenes_per_sec": "value", "infer_p50_ms": "p50_ms",
                  "vs_baseline_infer": "vs_baseline"},
        "train": {"train_scenes_per_sec": "value",
                  "vs_baseline_train": "vs_baseline"},
        "metrics": {"val_miou": "value", "val_pr50": "val_pr50",
                    "val_pr75": "val_pr75",
                    "upper_bound_miou": "upper_bound_miou",
                    "student_over_upper_bound": "student_over_upper_bound"},
        "ingest_scaling": {"ingest_scaling_efficiency": "value",
                           "ingest_scaling_sps": "scenes_per_sec"},
    }

    def combined_line():
        # If the fusion mode itself died, the lead value must be 0.0 with
        # an error marker — falling back to another mode's number would
        # report e.g. infer's ~94 scenes/sec as the fused-ingest headline.
        lead = results.get("fusion")
        out = {"metric": "fused_scenes_per_sec",
               "value": lead["value"] if lead else 0.0,
               "unit": "scenes/sec",
               "vs_baseline": lead["vs_baseline"] if lead else 0.0}
        if lead is None:
            out["error"] = errors.get("fusion", "fusion mode pending")
        for mode, keys in extra_keys.items():
            if mode in results:
                for k, src in keys.items():
                    if src in results[mode]:
                        out[k] = results[mode][src]
        return json.dumps(out)

    retries, timeout_s, backoff_s = _probe_params()

    def remaining():
        return total_budget - (time.perf_counter() - t_start)

    queue = list(modes)
    retried = set()
    while queue:
        name = queue.pop(0)
        # reserve deadline for the modes still after this one (fusion,
        # last, keeps everything left)
        reserve = sum(est[m] for m in queue)
        budget = min(cap[name], _mode_budget_s(), remaining() - reserve)
        if name == "ingest_scaling":
            budget = min(budget, float(
                os.environ.get("BENCH_SCALING_TIMEOUT", 900)))
        if remaining() < 120:
            errors.setdefault(name, "global deadline exhausted")
            print(f"# bench mode '{name}' SKIPPED: global deadline "
                  f"({total_budget:.0f}s) exhausted", flush=True)
            print(combined_line(), flush=True)
            continue
        # floor: a device mode pays ~30-60 s of import + tunnel init
        # before any work; below this a budget only buys a doomed run
        budget = max(budget, 120.0)
        # metrics falls back to CPU; ingest_scaling ALWAYS runs on forced
        # virtual CPU devices (subprocesses set JAX_PLATFORMS=cpu) — a
        # wedged chip must not skip it
        needs_device = (name not in ("metrics", "ingest_scaling")) \
            and not on_cpu
        if needs_device and not healthy:
            # bounded re-probe: never spend more than the spare budget
            healthy = _probe_device(max(retries // 2, 1),
                                    min(timeout_s, max(remaining()
                                                       - reserve, 60)),
                                    backoff_s)
            if not healthy:
                errors[name] = "device wedged (probe failed)"
                print(f"# bench mode '{name}' SKIPPED: device wedged",
                      flush=True)
                print(combined_line(), flush=True)
                continue
        env = dict(os.environ, BENCH_METRIC=name, BENCH_NO_PROBE="1")
        if name == "metrics" and not on_cpu and not healthy:
            # a prior device-mode FAILURE is not proof of a wedge (slow
            # tunnels time modes out while staying responsive); pinning
            # the 1-core CPU dooms the 200-epoch metrics loop, so demand
            # a failed probe before giving up the chip
            healthy = _probe_device(1, min(timeout_s, 90), 0)
            if not healthy:
                env["JAX_PLATFORMS"] = "cpu"
                print("# bench: running quality metrics on CPU (device "
                      "wedged)", flush=True)
        if name == "fusion" and remaining() < 300:
            # thin-budget fusion: fewer async scenes (the warm-compile
            # mode is ~120 s at 6 scenes; 4 shaves the steady tail)
            env.setdefault("BENCH_FUSION_SCENES", "4")
        t0 = time.perf_counter()
        rc, parsed = _run_mode_subprocess(name, env, budget)
        dt = time.perf_counter() - t0
        if parsed is not None and "error" not in parsed:
            results[name] = parsed
            print(f"# bench mode '{name}' done in {dt:.0f}s: {parsed}",
                  flush=True)
        else:
            errors[name] = (parsed or {}).get(
                "error", f"mode process died (rc={rc})")
            print(f"# bench mode '{name}' FAILED after {dt:.0f}s: "
                  f"{errors[name]}", flush=True)
            if needs_device:
                healthy = False  # re-probe before the next device mode
            if name not in retried:
                # ONE retry at the END of the queue with the leftover
                # budget: a timeout is usually a transiently slow tunnel
                # (infer has been measured at 54 s and >170 s within the
                # same half hour), not a wedge. Genuinely wedged devices
                # are caught by the pre-mode probe, which SKIPS (skips
                # don't retry) instead of burning budget; the metrics
                # retry pins CPU iff the device modes failed too.
                retried.add(name)
                queue.append(name)
                print(f"# bench: will retry '{name}' with the leftover "
                      "budget", flush=True)
        # re-print the combined line after EVERY mode: if the driver's
        # budget kills a later mode, the last printed JSON line still
        # carries everything that completed so far
        print(combined_line(), flush=True)
    if not results:
        print(json.dumps({"metric": "fused_scenes_per_sec", "value": 0.0,
                          "unit": "scenes/sec", "vs_baseline": 0.0,
                          "error": "all bench modes failed"}), flush=True)


def main():
    mode = os.environ.get("BENCH_METRIC")
    if mode:
        main_single(mode)
    else:
        main_combined()


if __name__ == "__main__":
    main()
