import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.sparse.topology import build_unet_topology
from dropclip_tpu.sparse.unet import MinkUNet, build_student

from test_sparse_topology import make_coords


def tiny_model(**kw):
    defaults = dict(out_channels=16, block="basic", layers=(1,) * 8,
                    planes=(4, 8, 8, 8, 8, 8, 8, 8), init_dim=4)
    defaults.update(kw)
    return MinkUNet(**defaults)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(1)
    cap = 128
    cs, ms = zip(*[make_coords(rng, 100 - 10 * i, cap) for i in range(2)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    feats = jnp.asarray(rng.randn(2, cap, 6).astype(np.float32)) * mask[..., None]
    topo = build_unet_topology(coords, mask)
    return topo, feats, mask


def test_forward_shapes_and_masking(batch):
    topo, feats, mask = batch
    model = tiny_model()
    # jit init AND apply, with topo passed as an ARGUMENT (closed-over
    # arrays become XLA constants and blow up compile time): the eager
    # gather-UNet dispatches thousands of ops per pass, ~30 s on this
    # 1-core box; compiled it's a few seconds
    def init_and_forward(t, f):
        v = model.init(jax.random.PRNGKey(0), t, f, train=False)
        return model.apply(v, t, f, train=False)

    out = jax.jit(init_and_forward)(topo, feats)  # ONE compile, not two
    assert out.shape == (2, 128, 16)
    # padded rows must be exactly zero
    pad = np.asarray(out)[~np.asarray(mask)]
    np.testing.assert_allclose(pad, 0.0)
    valid = np.asarray(out)[np.asarray(mask)]
    assert np.abs(valid).sum() > 0
    assert np.isfinite(valid).all()


@pytest.mark.slow
def test_train_mode_updates_batch_stats(batch):
    topo, feats, mask = batch
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=True)
    out, updates = model.apply(variables, topo, feats, train=True,
                               mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(np.asarray(b), np.asarray(a))
                  for b, a in zip(before, after))
    assert changed


@pytest.mark.slow
def test_padding_invariance():
    """Outputs at valid voxels must not depend on the padding capacity."""
    rng = np.random.RandomState(2)
    n = 60
    coords_s, mask_s = make_coords(rng, n, 64)
    feats_s = rng.randn(64, 6).astype(np.float32) * np.asarray(mask_s)[:, None]

    coords_l = jnp.concatenate([coords_s, jnp.zeros((64, 3), jnp.int32)])
    mask_l = jnp.concatenate([mask_s, jnp.zeros(64, bool)])
    feats_l = np.concatenate([feats_s, rng.randn(64, 6).astype(np.float32)])

    model = tiny_model()
    topo_s = build_unet_topology(coords_s[None], mask_s[None])
    topo_l = build_unet_topology(coords_l[None], mask_l[None])
    variables = model.init(jax.random.PRNGKey(0), topo_s,
                           jnp.asarray(feats_s)[None], train=False)
    out_s = model.apply(variables, topo_s, jnp.asarray(feats_s)[None], train=False)
    out_l = model.apply(variables, topo_l, jnp.asarray(feats_l)[None], train=False)
    np.testing.assert_allclose(np.asarray(out_s)[0, :n],
                               np.asarray(out_l)[0, :n], rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_cls_head(batch):
    topo, feats, mask = batch
    model = tiny_model(use_cls_head=True, n_classes=9)
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=False)
    out, logits = model.apply(variables, topo, feats, train=False)
    assert out.shape == (2, 128, 16)
    assert logits.shape == (2, 128, 9)


@pytest.mark.slow
def test_gradients_flow(batch):
    topo, feats, mask = batch
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=True)

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             topo, feats, train=True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(variables["params"])
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
    # every conv kernel receives gradient
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path


def test_build_student_parity_channels():
    cfg = CfgNode({"arch_3d": "MinkUNet14D", "feat_dim": 768,
                   "dropout_rate": 0.0, "use_cls_head": False, "n_classes": 44})
    model = build_student(cfg)
    assert model.planes == (32, 64, 128, 256, 384, 384, 384, 384)
    assert model.layers == (1,) * 8
    assert model.out_channels == 768
    assert model.init_dim == 32


@pytest.mark.slow
def test_mink14d_param_count(batch):
    """MinkUNet14D with 6-ch input ~ the reference student; sanity-check the
    parameter count is in the expected few-M range and all shapes exist."""
    topo, feats, mask = batch
    cfg = CfgNode({"arch_3d": "MinkUNet14D", "feat_dim": 768})
    model = build_student(cfg)
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=False)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 5_000_000 < n_params < 60_000_000, n_params


def test_registry_complete_both_engines():
    """Every reference-family arch (plus the 18C/101A-E gap-fillers —
    the reference's own MinkUNet50/101 are PLANES=None and absent from
    its factory, minkunet.py:212-219,266-289) constructs in BOTH engines
    with matching widths/depths."""
    from dropclip_tpu.sparse.unet import UNET_ARCHS
    from dropclip_tpu.sparse.unet_bricks import build_student_bricks

    expected = {"MinkUNet14A", "MinkUNet14B", "MinkUNet14C", "MinkUNet14D",
                "MinkUNet18A", "MinkUNet18B", "MinkUNet18C", "MinkUNet18D",
                "MinkUNet18E", "MinkUNet34A", "MinkUNet34B", "MinkUNet34C",
                "MinkUNet50", "MinkUNet101", "MinkUNet101A", "MinkUNet101B",
                "MinkUNet101C", "MinkUNet101D", "MinkUNet101E"}
    assert expected <= set(UNET_ARCHS)
    for name in sorted(expected):
        block, layers, planes = UNET_ARCHS[name]
        cfg = CfgNode({"arch_3d": name, "feat_dim": 768})
        dense = build_student(cfg)
        bricks = build_student_bricks(cfg)
        for m in (dense, bricks):
            assert tuple(m.planes) == tuple(planes), name
            assert tuple(m.layers) == tuple(layers), name
            assert m.block == block, name
        if name.startswith("MinkUNet101"):
            assert layers == (2, 3, 4, 23, 2, 2, 2, 2)
            assert block == "bottleneck"


@pytest.mark.slow
def test_deep_bottleneck_arch_forward(batch):
    """MinkUNet101-shape depth (Bottleneck, 23-deep stage 4) actually
    runs forward — at tiny widths via the planes override so CPU can
    compile it in seconds."""
    topo, feats, mask = batch
    cfg = CfgNode({"arch_3d": "MinkUNet101C", "feat_dim": 8,
                   "planes": [4, 4, 8, 8, 8, 8, 4, 4], "init_dim": 4})
    model = build_student(cfg)
    assert model.block == "bottleneck" and model.layers[3] == 23
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=False)
    out = model.apply(variables, topo, feats, train=False)
    assert out.shape == feats.shape[:-1] + (8,)
    assert np.isfinite(np.asarray(out)).all()
