import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.distill.engine import DistilBatch, make_eval_step, make_train_step
from dropclip_tpu.distill.loss import (
    aux_hinge_loss,
    cosine_distil_loss,
    cross_entropy_cls_loss,
    l1_distil_loss,
)
from dropclip_tpu.distill.train_state import create_train_state, make_optimizer
from dropclip_tpu.sparse.topology import build_unet_topology
from dropclip_tpu.sparse.unet import MinkUNet

from test_sparse_topology import make_coords


def reference_hinge_torch(features_list, labels_list, margin=0.05):
    """Numpy/torch transliteration of reference engine/distil.py:52-96."""
    import torch
    import torch.nn.functional as F

    batch_margin_loss = 0.0
    batch_pos_loss = 0.0
    for features, labels in zip(features_list, labels_list):
        features = torch.as_tensor(features)
        labels = torch.as_tensor(labels)
        features = F.normalize(features, p=2, dim=-1)
        unique_labels = torch.unique(labels)
        K = len(unique_labels)
        masks = labels.unsqueeze(0) == unique_labels.unsqueeze(1)
        mean_features = torch.matmul(masks.float(), features) / masks.sum(1, keepdim=True).float()
        K_mask = ~F.one_hot(torch.arange(0, K)).bool()
        scene_margin_loss = 0.0
        scene_pos_loss = 0.0
        for k in range(K):
            mask_features = features[masks[k]]
            cos_sim = torch.mm(mask_features, mask_features.t())
            pos_cos_sim = cos_sim.mean()
            scene_pos_loss += 1.0 - pos_cos_sim
            other_features = K_mask[k].unsqueeze(1) * mean_features
            neg_cos_sim = F.cosine_similarity(
                mask_features.unsqueeze(1), other_features.unsqueeze(0), dim=2).mean()
            scene_margin_loss += torch.clip(-pos_cos_sim + neg_cos_sim + margin, 0)
        batch_margin_loss += scene_margin_loss / K
        batch_pos_loss += scene_pos_loss / K
    return (float(batch_pos_loss) / len(features_list),
            float(batch_margin_loss) / len(features_list))


def test_cosine_loss_matches_torch(rng):
    import torch

    out = rng.randn(2, 50, 16).astype(np.float32)
    tgt = rng.randn(2, 50, 16).astype(np.float32)
    mask = np.ones((2, 50), bool)
    want = float((1 - torch.nn.CosineSimilarity(dim=-1)(
        torch.as_tensor(out), torch.as_tensor(tgt))).mean())
    got = float(cosine_distil_loss(jnp.asarray(out), jnp.asarray(tgt),
                                   jnp.asarray(mask)))
    assert abs(got - want) < 1e-5


def test_cosine_loss_ignores_padding(rng):
    out = rng.randn(1, 40, 8).astype(np.float32)
    tgt = rng.randn(1, 40, 8).astype(np.float32)
    mask = np.zeros((1, 40), bool)
    mask[0, :20] = True
    a = float(cosine_distil_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(mask)))
    out2 = out.copy()
    out2[0, 20:] = 999.0
    b = float(cosine_distil_loss(jnp.asarray(out2), jnp.asarray(tgt), jnp.asarray(mask)))
    assert abs(a - b) < 1e-6


def test_l1_loss_matches_torch(rng):
    import torch

    out = rng.randn(2, 30, 8).astype(np.float32)
    tgt = rng.randn(2, 30, 8).astype(np.float32)
    want = float(torch.nn.L1Loss()(torch.as_tensor(out), torch.as_tensor(tgt)))
    got = float(l1_distil_loss(jnp.asarray(out), jnp.asarray(tgt),
                               jnp.ones((2, 30), bool)))
    assert abs(got - want) < 1e-6


def test_aux_hinge_matches_reference(rng):
    b, m, c = 2, 64, 12
    feats = rng.randn(b, m, c).astype(np.float32)
    labels = rng.randint(0, 5, size=(b, m)).astype(np.int32)
    want_pos, want_mar = reference_hinge_torch(list(feats), list(labels))
    pos, mar = aux_hinge_loss(jnp.asarray(feats), jnp.asarray(labels),
                              jnp.ones((b, m), bool), max_labels=8)
    assert abs(float(pos) - want_pos) < 1e-4
    assert abs(float(mar) - want_mar) < 1e-4


def test_aux_hinge_padding_invariance(rng):
    m = 40
    feats = rng.randn(1, m, 8).astype(np.float32)
    labels = rng.randint(0, 4, size=(1, m)).astype(np.int32)
    mask = np.ones((1, m), bool)
    p1, m1 = aux_hinge_loss(jnp.asarray(feats), jnp.asarray(labels),
                            jnp.asarray(mask), max_labels=8)
    feats_p = np.concatenate([feats, rng.randn(1, 10, 8).astype(np.float32)], axis=1)
    labels_p = np.concatenate([labels, np.full((1, 10), 6, np.int32)], axis=1)
    mask_p = np.concatenate([mask, np.zeros((1, 10), bool)], axis=1)
    p2, m2 = aux_hinge_loss(jnp.asarray(feats_p), jnp.asarray(labels_p),
                            jnp.asarray(mask_p), max_labels=8)
    assert abs(float(p1) - float(p2)) < 1e-5
    assert abs(float(m1) - float(m2)) < 1e-5


def test_cross_entropy_ignore(rng):
    import torch

    logits = rng.randn(1, 20, 7).astype(np.float32)
    labels = rng.randint(0, 7, size=(1, 20)).astype(np.int32)
    labels[0, :5] = 255
    want = float(torch.nn.CrossEntropyLoss(ignore_index=255)(
        torch.as_tensor(logits[0]), torch.as_tensor(labels[0]).long()))
    got = float(cross_entropy_cls_loss(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.ones((1, 20), bool)))
    assert abs(got - want) < 1e-5


# ---------------------------------------------------------------- train step

CFG = CfgNode({
    "sparse_backend": "gather",
    "arch_3d": "tiny", "feat_dim": 16, "loss_type": "cosine",
    "use_aux_loss": False, "use_cls_head": False, "base_lr": 1e-3,
    "min_lr": 1e-4, "epochs": 10, "weight_decay": 1e-5, "max_norm": 5.0,
})


def tiny_model():
    return MinkUNet(out_channels=16, block="basic", layers=(1,) * 8,
                    planes=(4, 4, 8, 8, 8, 8, 4, 4), init_dim=4)


def make_batch(rng, b=2, cap=64):
    cs, ms = zip(*[make_coords(rng, 40, cap) for _ in range(b)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    feats = jnp.asarray(rng.randn(b, cap, 6).astype(np.float32)) * mask[..., None]
    targets = jnp.asarray(rng.randn(b, cap, 16).astype(np.float32)) * mask[..., None]
    labels = jnp.asarray(rng.randint(0, 4, size=(b, cap)).astype(np.int32))
    return DistilBatch(coords=coords, mask=mask, in_feats=feats,
                       targets=targets, labels=labels, labels_cls=labels)


def test_train_step_reduces_loss(rng):
    model = tiny_model()
    batch = make_batch(rng)
    topo = build_unet_topology(batch.coords, batch.mask)
    tx = make_optimizer(CFG, iters_per_epoch=10)
    state = create_train_state(model, topo, batch.in_feats, tx)
    step = jax.jit(make_train_step(CFG))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["distil_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_scanned_train_matches_python_loop(rng):
    """make_scanned_train over 2 chunks == 6 python-loop steps: same
    jax.random.split chain, same batch gathers, same final params."""
    from dropclip_tpu.distill.engine import make_scanned_train

    model = tiny_model()
    n_scenes, bsz, cap = 4, 2, 64
    cs, ms = zip(*[make_coords(rng, 40, cap) for _ in range(n_scenes)])
    data = DistilBatch(
        coords=jnp.stack(cs), mask=jnp.stack(ms),
        in_feats=jnp.asarray(rng.randn(n_scenes, cap, 6).astype(np.float32)),
        targets=jnp.asarray(rng.randn(n_scenes, cap, 16).astype(np.float32)),
        labels=jnp.asarray(rng.randint(0, 4, (n_scenes, cap)).astype(np.int32)),
        labels_cls=jnp.zeros((n_scenes, cap), jnp.int32))
    schedule = np.array([[0, 1], [2, 3], [1, 2], [3, 0], [0, 2], [1, 3]],
                        np.int32)

    def gather(idx):
        return jax.tree.map(lambda a: a[np.asarray(idx)], data)

    topo = build_unet_topology(data.coords[:bsz], data.mask[:bsz])
    tx = make_optimizer(CFG, iters_per_epoch=3)
    state0 = create_train_state(model, topo, data.in_feats[:bsz], tx)

    # python loop
    step = jax.jit(make_train_step(CFG))
    state_ref, key = state0, jax.random.PRNGKey(7)
    ref_losses = []
    for idx in schedule:
        key, sub = jax.random.split(key)
        state_ref, m = step(state_ref, gather(idx), sub)
        ref_losses.append(float(m["distil_loss"]))

    # two scanned chunks through the same schedule
    chunk = jax.jit(make_scanned_train(CFG), donate_argnums=0)
    state_s, key_s = state0, jax.random.PRNGKey(7)
    losses = []
    for rows in (schedule[:3], schedule[3:]):
        state_s, key_s, metrics = chunk(state_s, data, jnp.asarray(rows), key_s)
        losses.extend(np.asarray(metrics["distil_loss"]).tolist())

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)
    assert int(state_s.step) == int(state_ref.step) == len(schedule)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state_ref.params, state_s.params)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_eval_step(rng):
    model = tiny_model()
    batch = make_batch(rng)
    topo = build_unet_topology(batch.coords, batch.mask)
    tx = make_optimizer(CFG, iters_per_epoch=10)
    state = create_train_state(model, topo, batch.in_feats, tx)
    out, metrics = jax.jit(make_eval_step(CFG))(state, batch)
    assert out.shape == (2, 64, 16)
    assert np.isfinite(float(metrics["distil_loss"]))


def test_data_parallel_matches_single_device(rng):
    """DP loss/grads over an 8-device mesh == single device on same batch —
    the TPU analogue of DDP-vs-single-GPU parity (SURVEY §4e)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dropclip_tpu.core.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    model = tiny_model()
    batch = make_batch(rng, b=8)
    topo = build_unet_topology(batch.coords, batch.mask)
    tx = make_optimizer(CFG, iters_per_epoch=10)
    state = create_train_state(model, topo, batch.in_feats, tx)
    step = make_train_step(CFG)

    # single device
    s1, m1 = jax.jit(step)(state, batch)

    # 8-way data parallel
    mesh = make_mesh(n_data=8)
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    batch_sharded = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)
    state_rep = jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state)
    s8, m8 = jax.jit(step)(state_rep, batch_sharded)

    assert abs(float(m1["distil_loss"]) - float(m8["distil_loss"])) < 1e-5
    # parameters after the step agree
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     s1.params, s8.params)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_aux_and_cls_paths_run(rng):
    batch = make_batch(rng)
    topo = build_unet_topology(batch.coords, batch.mask)

    cfg_aux = CfgNode({**CFG, "use_aux_loss": True, "max_objects": 8})
    model = tiny_model()
    tx = make_optimizer(cfg_aux, 10)
    state = create_train_state(model, topo, batch.in_feats, tx)
    _, metrics = jax.jit(make_train_step(cfg_aux))(state, batch)
    assert np.isfinite(float(metrics["aux_loss"]))

    cfg_cls = CfgNode({**CFG, "use_cls_head": True, "n_classes": 9,
                       "ignore_label": 255, "loss_weight_cls": 0.1})
    model2 = MinkUNet(out_channels=16, block="basic", layers=(1,) * 8,
                      planes=(4, 4, 8, 8, 8, 8, 4, 4), init_dim=4,
                      use_cls_head=True, n_classes=9)
    tx2 = make_optimizer(cfg_cls, 10)
    state2 = create_train_state(model2, topo, batch.in_feats, tx2)
    _, metrics2 = jax.jit(make_train_step(cfg_cls))(state2, batch)
    assert np.isfinite(float(metrics2["aux_loss"]))


def test_checkpoint_roundtrip(tmp_path, rng):
    from dropclip_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

    model = tiny_model()
    batch = make_batch(rng)
    topo = build_unet_topology(batch.coords, batch.mask)
    tx = make_optimizer(CFG, 10)
    state = create_train_state(model, topo, batch.in_feats, tx)
    state, _ = jax.jit(make_train_step(CFG))(state, batch)

    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats}
    save_checkpoint(str(tmp_path), payload)
    restored = restore_checkpoint(str(tmp_path), payload)
    assert restored is not None
    assert int(restored["step"]) == 1
    same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
                        payload["params"], restored["params"])
    assert all(jax.tree.leaves(same))
    assert restore_checkpoint(str(tmp_path / "nope"), payload) is None


def test_data_parallel_bricks_anisotropic(rng):
    """Same DP parity on the PRODUCTION engine config: bricks backend,
    (4, 4, 2) brick shape (the canonical configs' choice)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dropclip_tpu.core.mesh import make_mesh
    from dropclip_tpu.distill.engine import build_student_for, build_topology

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = CfgNode({**CFG, "sparse_backend": "bricks",
                   "arch_3d": "MinkUNet14A", "feat_dim": 16,
                   "brick_shape": [4, 4, 2],
                   "brick_capacities": [64, 64, 64, 64, 64]})
    cfg.arch_3d = None  # build_student_bricks default arch is 14D — too
    # heavy for CPU; use the tiny topology via explicit planes instead
    from dropclip_tpu.sparse.unet_bricks import MinkUNetBricks

    model = MinkUNetBricks(out_channels=16, block="basic", layers=(1,) * 8,
                           planes=(4, 4, 8, 8, 8, 8, 4, 4), init_dim=4,
                           remat=False)
    batch = make_batch(rng, b=8)
    topo = build_topology(cfg, batch.coords, batch.mask)
    assert topo.levels[0].occ.shape[2:] == (4, 4, 2)
    tx = make_optimizer(cfg, iters_per_epoch=10)
    state = create_train_state(model, topo, batch.in_feats, tx)

    from dropclip_tpu.distill.engine import make_train_step

    import dropclip_tpu.distill.engine as eng

    orig = eng.build_student_for
    eng.build_student_for = lambda c: model
    try:
        step = make_train_step(cfg)
        s1, m1 = jax.jit(step)(state, batch)
        mesh = make_mesh(n_data=8)
        bsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        bs = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)
        sr = jax.tree.map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
            state)
        s8, m8 = jax.jit(step)(sr, bs)
    finally:
        eng.build_student_for = orig
    assert np.isfinite(float(m1["distil_loss"]))
    assert abs(float(m1["distil_loss"]) - float(m8["distil_loss"])) < 1e-5
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     s1.params, s8.params)
    assert max(jax.tree.leaves(d)) < 1e-4
