"""Reference-checkpoint converter round-trip: our init tree -> fake ME
state dict (inverse mapping) -> from_minkowski_state_dict -> identical
tree that loads into both engines."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

import jax
import jax.numpy as jnp

from dropclip_tpu.sparse.convert_student import (_perm,
                                                 from_minkowski_state_dict)
from dropclip_tpu.sparse.unet import UNET_ARCHS, MinkUNet

ARCH = "tiny"


def _inv_conv(w: np.ndarray, ksize: int, order: str) -> np.ndarray:
    w = np.asarray(w)
    if ksize == 1:
        return w[0]  # ME stores 1x1 as (Cin, Cout)
    p = _perm(ksize, order)
    inv = np.empty_like(p)
    inv[p] = np.arange(len(p))
    return w[inv]


def _to_me(params, stats, order):
    """Inverse of from_minkowski_state_dict for the tiny/basic arch."""
    sd = {}

    def put_bn(ref, p, s):
        sd[f"{ref}.bn.weight"] = p["scale"]
        sd[f"{ref}.bn.bias"] = p["bias"]
        sd[f"{ref}.bn.running_mean"] = s["mean"]
        sd[f"{ref}.bn.running_var"] = s["var"]

    sd["conv0p1s1.kernel"] = _inv_conv(params["conv0p1s1"]["kernel"], 5,
                                       order)
    put_bn("bn0", params["bn0"], stats["bn0"])
    for i in range(1, 5):
        stride = [1, 2, 4, 8][i - 1]
        sd[f"conv{i}p{stride}s2.kernel"] = _inv_conv(
            params[f"conv{i}"]["kernel"], 2, order)
        put_bn(f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
    for d in range(4):
        stride = 16 >> d
        sd[f"convtr{4+d}p{stride}s2.kernel"] = _inv_conv(
            params[f"convtr{4+d}"]["kernel"], 2, order)
        put_bn(f"bntr{4+d}", params[f"bntr{4+d}"], stats[f"bntr{4+d}"])
    for b in range(1, 9):
        our = params[f"block{b}_0"]
        ssub = stats[f"block{b}_0"]
        ref = f"block{b}.0"
        sd[f"{ref}.conv1.kernel"] = _inv_conv(our["conv1"]["kernel"], 3,
                                              order)
        sd[f"{ref}.conv2.kernel"] = _inv_conv(our["conv2"]["kernel"], 3,
                                              order)
        put_bn(f"{ref}.norm1", our["norm1"], ssub["norm1"])
        put_bn(f"{ref}.norm2", our["norm2"], ssub["norm2"])
        if "downsample_conv" in our:
            sd[f"{ref}.downsample.0.kernel"] = _inv_conv(
                our["downsample_conv"]["kernel"], 1, order)
            put_bn(f"{ref}.downsample.1", our["downsample_norm"],
                   ssub["downsample_norm"])
    sd["final.kernel"] = _inv_conv(params["final"]["kernel"], 1, order)
    # DDP + DisNet wrapping, as real checkpoints have
    return {f"module.net3d.{k}": v for k, v in sd.items()}


@pytest.mark.parametrize("order", ["x_fastest", "z_fastest"])
def test_roundtrip(rng, order):
    from test_sparse_topology import make_coords

    from dropclip_tpu.sparse.topology import build_unet_topology

    block, layers, planes = UNET_ARCHS[ARCH]
    model = MinkUNet(out_channels=16, block=block, layers=layers,
                     planes=planes, init_dim=4)
    cap = 128
    coords, mask = make_coords(rng, 60, cap)
    topo = build_unet_topology(coords[None], mask[None], num_levels=5,
                               capacities=(cap,) * 5)
    feats = jnp.asarray(rng.randn(1, cap, 6).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), topo, feats, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    # make batch stats non-trivial
    stats = jax.tree.map(lambda x: x + 0.25, stats)

    sd = _to_me(params, stats, order)
    got_p, got_s = from_minkowski_state_dict(sd, arch=ARCH,
                                             offset_order=order)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(got_p)[0])
    assert set(map(str, flat_a)) == set(map(str, flat_b))
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
    flat_sa = dict(jax.tree_util.tree_flatten_with_path(stats)[0])
    flat_sb = dict(jax.tree_util.tree_flatten_with_path(got_s)[0])
    assert set(map(str, flat_sa)) == set(map(str, flat_sb))

    # the converted tree runs in the model
    out = model.apply({"params": got_p, "batch_stats": got_s}, topo, feats,
                      train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_orders_differ(rng):
    """The two ME-ordering hypotheses produce genuinely different kernels
    (the permutation is not a no-op) except on symmetric entries."""
    p = _perm(3, "x_fastest")
    assert not np.array_equal(p, np.arange(27))
    assert sorted(p.tolist()) == list(range(27))
