"""Op-level profiler over the framework's hot surfaces.

The reference has no in-repo profiling story (perf work there means
nvprof/nsight outside the codebase); here tracing is a framework
feature (SURVEY §5 aux subsystems). One jitted surface runs under
``jax.profiler.trace`` on synthetic inputs at production shapes, and the
per-op device table prints straight from the xplane proto
(`core/xplane.py` — the tensorboard profile plugin in typical images is
version-broken, so no tensorboard needed). This is the exact methodology
behind every roofline study in PERF.md, promoted to a CLI.

Surfaces:

- ``train``   one full distillation train step (brick engine, recipe
              shapes: batch 8 x 8192 voxels, MinkUNet14D, bf16)
- ``infer``   single-view student forward + paired-softmax grounding
- ``teacher`` the ingest-dominating CLIP visual forward (a 96-crop
              ViT-L/14@336px chunk — see PERF.md "Offline ingest")
- ``fusion``  multi-view point-level feature fusion

On TPU the table reports hardware-trace op durations; on CPU it falls
back to host thunk times (relative ranking only). ``--tiny`` shrinks
every surface for a seconds-long smoke run on any backend.

Usage::

    python -m dropclip_tpu.tools.profile --surface teacher --top 30
    python -m dropclip_tpu.tools.profile --surface train \
        --logdir /tmp/prof_train   # keep the trace for later parsing
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np

from ..core.platform import honor_jax_platforms_env


def _surface_train(tiny: bool):
    import jax
    import jax.numpy as jnp

    from ..core.config import CfgNode
    from ..data.synthetic import make_tabletop_coords
    from ..distill.engine import (DistilBatch, build_student_for,
                                  build_topology, make_train_step)
    from ..distill.train_state import create_train_state, make_optimizer
    from ..sparse.bricks import autotune_brick_capacities

    b, m = (2, 256) if tiny else (8, 8192)
    cfg = CfgNode(dict(arch_3d="MinkUNet14A" if tiny else "MinkUNet14D",
                       feat_dim=16 if tiny else 768, loss_type="cosine",
                       base_lr=3e-4, min_lr=1e-4, epochs=200,
                       weight_decay=1e-5, max_norm=5.0,
                       brick_shape=[4, 4, 2], remat=False))
    rng = np.random.RandomState(0)
    coords_np, mask_np = make_tabletop_coords(
        rng, b, m, n_occ=128 if tiny else 6000, ext=8 if tiny else 40)
    coords, mask = jnp.asarray(coords_np), jnp.asarray(mask_np)
    feats = (jnp.asarray(rng.randn(b, m, 6).astype(np.float32))
             * mask[..., None]).astype(jnp.bfloat16)
    targets = jnp.asarray(rng.randn(b, m, int(cfg.feat_dim)).astype(
        np.float32)) * mask[..., None]
    labels = jnp.zeros((b, m), jnp.int32)
    batch = DistilBatch(coords, mask, feats, targets, labels, labels)
    cfg.brick_capacities = list(autotune_brick_capacities(
        coords_np, mask_np, slack=1.5, brick_shape=(4, 4, 2)))

    model = build_student_for(cfg)
    topo = build_topology(cfg, coords, mask)
    state = create_train_state(model, topo, feats,
                               make_optimizer(cfg, 100))
    step = jax.jit(make_train_step(cfg))

    def run():
        nonlocal state
        state, metrics = step(state, batch)
        return float(metrics["distil_loss"])

    return run


def _surface_infer(tiny: bool):
    import jax
    import jax.numpy as jnp

    from ..data.synthetic import make_tabletop_coords
    from ..similarity import predict_from_embeddings
    from ..sparse.bricks import (autotune_brick_capacities,
                                 build_brick_topology)
    from ..sparse.unet import UNET_ARCHS
    from ..sparse.unet_bricks import MinkUNetBricks

    b, m = (2, 256) if tiny else (8, 8192)
    c_out = 16 if tiny else 768
    block, layers, planes = UNET_ARCHS["MinkUNet14A" if tiny
                                       else "MinkUNet14D"]
    model = MinkUNetBricks(out_channels=c_out, block=block, layers=layers,
                           planes=planes)
    rng = np.random.RandomState(0)
    coords_np, mask_np = make_tabletop_coords(
        rng, b, m, n_occ=128 if tiny else 6000, ext=8 if tiny else 40)
    coords, mask = jnp.asarray(coords_np), jnp.asarray(mask_np)
    feats = (jnp.asarray(rng.randn(b, m, 6).astype(np.float32))
             * mask[..., None]).astype(jnp.bfloat16)
    bshape = (4, 4, 2)
    caps = autotune_brick_capacities(coords_np, mask_np, brick_shape=bshape)
    topo = build_brick_topology(coords, mask, brick_capacities=caps,
                                brick_shape=bshape)
    variables = jax.jit(
        lambda t, f: model.init(jax.random.PRNGKey(0), t, f, train=False)
    )(topo, feats)
    nq, nneg = 8, 8
    qpos = jnp.asarray(rng.randn(nq, c_out).astype(np.float32))
    qpos = qpos / jnp.linalg.norm(qpos, axis=-1, keepdims=True)
    qneg = jnp.asarray(rng.randn(nq, nneg, c_out).astype(np.float32))
    qneg = qneg / jnp.linalg.norm(qneg, axis=-1, keepdims=True)

    @jax.jit
    def forward(variables, coords, mask, feats, qpos, qneg):
        topo = build_brick_topology(coords, mask, brick_capacities=caps,
                                    brick_shape=bshape)
        out = model.apply(variables, topo, feats, train=False)

        def ground_scene(feats_s, mask_s):
            def one_q(pos, negs):
                pred, sims = predict_from_embeddings(
                    feats_s, pos, negs, mask=mask_s, method="paired",
                    threshold=0.75)
                return pred.astype(jnp.float32).sum() + sims.sum()

            return jax.vmap(one_q)(qpos, qneg).sum()

        return jax.vmap(ground_scene)(out, mask).sum()

    def run():
        return float(forward(variables, coords, mask, feats, qpos, qneg))

    return run


def _surface_teacher(tiny: bool, model_name: str, crops: int):
    import jax
    import jax.numpy as jnp

    from ..teachers.clip import build_clip

    name = "tiny-test" if tiny else model_name
    model = build_clip(name, dtype=jnp.bfloat16)
    res = model.image_resolution
    b = 4 if tiny else crops
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(b, res, res, 3).astype(np.float32)
                         ).astype(jnp.bfloat16)
    variables = jax.jit(
        lambda k, p: model.init(k, p, jnp.zeros((1, 77), jnp.int32))
    )(jax.random.PRNGKey(0), pixels[:1])

    @jax.jit
    def forward(variables, pixels):
        emb = model.apply(variables, pixels, method="encode_image")
        return jnp.sum(emb.astype(jnp.float32))

    def run():
        return float(forward(variables, pixels))

    return run


def _surface_fusion(tiny: bool):
    import jax.numpy as jnp

    from ..data.synthetic import make_raw_scene
    from ..fusion.core import FusionConfig, fuse_points

    rng = np.random.default_rng(0)
    n_views, hw = (2, (24, 32)) if tiny else (8, (480, 640))
    c = 16 if tiny else 768
    raw = make_raw_scene(rng, n_objects=3, n_points_per_obj=120,
                         n_views=n_views, hw=hw)
    ph, pw = (hw[0] // 8, hw[1] // 8)
    pfeat = jnp.asarray(
        rng.normal(size=(n_views, ph, pw, c)).astype(np.float32))
    cfg = FusionConfig(image_hw=hw, use_similarity=False)
    points = jnp.asarray(raw["points"].astype(np.float32))
    depths = jnp.asarray(raw["depths"].astype(np.float32))
    segs = jnp.asarray(raw["segs"].astype(np.int32))
    poses = jnp.asarray(raw["poses"].astype(np.float32))
    K = jnp.asarray(raw["K"].astype(np.float32))

    def run():
        fused = fuse_points(points, depths, segs, poses, pfeat, None, K, cfg)
        return float(jnp.nansum(fused.features))

    return run


def main(argv=None) -> int:
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(
        description="profile one hot surface and print the per-op table")
    ap.add_argument("--surface", required=True,
                    choices=["train", "infer", "teacher", "fusion"])
    ap.add_argument("--logdir", default=None,
                    help="trace output dir (default: a fresh tempdir)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3,
                    help="traced repetitions (post-warmup)")
    ap.add_argument("--tiny", action="store_true",
                    help="seconds-long smoke shapes (any backend)")
    ap.add_argument("--clip-model", default="ViT-L/14@336px",
                    help="teacher surface tower")
    ap.add_argument("--crops", type=int, default=96,
                    help="teacher surface batch (ingest chunk = 96)")
    args = ap.parse_args(argv)

    import jax

    logdir = args.logdir or tempfile.mkdtemp(prefix="dropclip_prof_")
    builders = {"train": lambda: _surface_train(args.tiny),
                "infer": lambda: _surface_infer(args.tiny),
                "teacher": lambda: _surface_teacher(
                    args.tiny, args.clip_model, args.crops),
                "fusion": lambda: _surface_fusion(args.tiny)}
    print(f"# building surface '{args.surface}' "
          f"(backend={jax.default_backend()}, tiny={args.tiny})", flush=True)
    run = builders[args.surface]()
    print("# warmup/compile...", flush=True)
    run()
    print(f"# tracing {args.reps} reps -> {logdir}", flush=True)
    with jax.profiler.trace(logdir):
        for _ in range(args.reps):
            run()  # each rep syncs on a fetched scalar
    from ..core.xplane import print_profile

    print_profile(logdir, top=args.top)
    print(f"# trace kept at {logdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
