"""Export the deployable grounding program as a serialized StableHLO
artifact (``jax.export``).

The reference has no deployment/export story at all — serving means
carrying the full Python stack (torch + MinkowskiEngine + the repo) and
re-tracing on every process start (reference tools/validate_blender.py:
266-320 is the closest thing to a serve path). Here the whole device
program — brick topology build -> sparse UNet forward -> paired-softmax
grounding against precomputed text embeddings — is exported ONCE with
the student weights baked in as constants, to a single portable file a
consumer loads with ``dropclip_tpu.serve.load_exported`` (or raw
``jax.export.deserialize``) and runs WITHOUT the model code, the
checkpoint, or the config. Text encoding stays host-side by design: the
serve contract takes (Q, C) positive and (Q, Nneg, C) negative text
embeddings, which a text front-end (the CLIP text tower, or a cache of
canonical prompts) produces independently.

The artifact is lowered for explicit target platforms (default: tpu +
cpu) — one file serves production TPU and local CPU smoke identically.

Usage::

    python -m dropclip_tpu.tools.export_model \
        --config configs/DistilBlender.yaml --ckpt-dir exp/run1 \
        --out student_serve.jaxexp --nq 8 --nneg 8 --check

    # smoke (random weights, tiny arch):
    python -m dropclip_tpu.tools.export_model --config configs/... \
        --random-init --out /tmp/m.jaxexp --check
"""

from __future__ import annotations

import argparse

import numpy as np

from ..core.platform import honor_jax_platforms_env


def build_serve_fn(cfg, variables, nq: int, nneg: int):
    """The device program exported for serving (batch 1, static shapes).

    (coords (1, cap, 3) i32, mask (1, cap) bool, in_feats (1, cap, F)
    f32, qpos (nq, C) f32, qneg (nq, nneg, C) f32) ->
    (masks (nq, cap) bool, sims (nq, cap) f32, dropped () i32)

    Voxelization stays host-side (``data.voxelize_np``, as in
    GroundingPipeline.featurize); ``dropped`` surfaces brick capacity /
    grid-extent overflow so the serving layer can alert instead of
    silently losing geometry.
    """
    import jax
    import jax.numpy as jnp

    from ..distill.engine import (build_student_for, build_topology,
                                  topology_dropped)
    from ..similarity import predict_from_embeddings

    model = build_student_for(cfg)
    method = str(cfg.sim_method or "paired")
    threshold = float(cfg.sim_norm_thresh or 0.75)

    def serve_fn(coords, mask, in_feats, qpos, qneg):
        topo = build_topology(cfg, coords, mask)
        out = model.apply(variables, topo, in_feats, train=False)
        out = out[0] if isinstance(out, tuple) else out
        feats = out[0]  # batch 1

        def one_q(pos, negs):
            return predict_from_embeddings(
                feats, pos, negs, mask=mask[0], method=method,
                threshold=threshold)

        masks, sims = jax.vmap(one_q)(qpos, qneg)
        return masks, sims, topology_dropped(topo)

    return serve_fn


def example_inputs(cfg, nq: int, nneg: int, seed: int = 0):
    import jax.numpy as jnp

    cap = int(cfg.voxel_capacity or 8192)
    fdim = 6 if cfg.use_color else 3
    c = int(cfg.feat_dim or 768)
    rng = np.random.RandomState(seed)
    coords = jnp.asarray(rng.randint(-8, 8, size=(1, cap, 3)), jnp.int32)
    mask = jnp.asarray(np.arange(cap)[None] < max(cap // 2, 1))
    feats = jnp.asarray(rng.randn(1, cap, fdim), jnp.float32)

    def unit(shape):
        e = rng.randn(*shape).astype(np.float32)
        return jnp.asarray(e / np.linalg.norm(e, axis=-1, keepdims=True))

    return coords, mask, feats, unit((nq, c)), unit((nq, nneg, c))


def export_serve(cfg, variables, out_path: str, nq: int, nneg: int,
                 platforms) -> "object":
    """Lower + serialize; returns the jax.export.Exported object."""
    import jax
    from jax import export

    serve_fn = build_serve_fn(cfg, variables, nq, nneg)
    args = example_inputs(cfg, nq, nneg)
    specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
    exported = export.export(jax.jit(serve_fn),
                             platforms=tuple(platforms))(*specs)
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    return exported


def _load_variables(args, cfg):
    """Checkpoint restore (trainer orbax layout) or random skeleton."""
    import jax
    import jax.numpy as jnp

    from ..distill.engine import build_student_for, build_topology
    from ..distill.train_state import create_train_state, make_optimizer

    model = build_student_for(cfg)
    cap = int(cfg.voxel_capacity or 8192)
    coords = jnp.zeros((1, cap, 3), jnp.int32)
    mask = jnp.zeros((1, cap), bool).at[:, :8].set(True)
    feats = jnp.zeros((1, cap, 6 if cfg.use_color else 3), jnp.float32)
    topo = build_topology(cfg, coords, mask)
    state = create_train_state(model, topo, feats, make_optimizer(cfg, 1))
    if args.random_init:
        return {"params": state.params, "batch_stats": state.batch_stats}
    from ..core.checkpoint import restore_checkpoint

    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats,
               "opt_state": state.opt_state, "epoch": 0, "best_val": 0.0}
    restored = restore_checkpoint(args.ckpt_dir, payload,
                                  name=args.ckpt_name)
    assert restored is not None, f"no checkpoint at {args.ckpt_dir}"
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


def main(argv=None) -> int:
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(
        description="export the grounding program as serialized StableHLO")
    ap.add_argument("--config", required=True)
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=None,
                    help="config overrides, 'key value ...' (the CLIs' "
                         "--opts; must reproduce shape-affecting training "
                         "options)")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-name", default="best_sim_loss_model")
    ap.add_argument("--random-init", action="store_true",
                    help="random weights (smoke/e2e test mode)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--nq", type=int, default=8,
                    help="query bucket the artifact serves")
    ap.add_argument("--nneg", type=int, default=8,
                    help="negatives per query")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets")
    ap.add_argument("--check", action="store_true",
                    help="deserialize + run on this host and compare to "
                         "the live program")
    args = ap.parse_args(argv)
    assert args.random_init or args.ckpt_dir, \
        "need --ckpt-dir (or --random-init for smoke)"

    from ..core.config import load_cfg_from_cfg_file, merge_cfg_from_list

    cfg = load_cfg_from_cfg_file(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, list(args.opts))

    variables = _load_variables(args, cfg)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    exported = export_serve(cfg, variables, args.out, args.nq, args.nneg,
                            platforms)
    import os

    print(f"exported {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"platforms={list(exported.platforms)}, "
          f"in_avals={[str(a) for a in exported.in_avals]})")

    if args.check:
        import jax

        from ..serve import load_exported

        if jax.default_backend() not in platforms:
            print(f"# check skipped: host backend "
                  f"{jax.default_backend()!r} not in {platforms}")
            return 0
        run = load_exported(args.out)
        inputs = example_inputs(cfg, args.nq, args.nneg, seed=1)
        got = run(*inputs)
        want = jax.jit(build_serve_fn(cfg, variables, args.nq, args.nneg)
                       )(*inputs)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(want[1]), rtol=2e-5,
                                   atol=2e-5)
        print("# roundtrip check ok: deserialized artifact matches the "
              "live program")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
