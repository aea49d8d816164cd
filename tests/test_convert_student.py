"""Reference-checkpoint converter round-trip: our init tree -> fake ME
state dict (inverse mapping) -> from_minkowski_state_dict -> identical
tree that loads into both engines."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

import jax
import jax.numpy as jnp

from dropclip_tpu.sparse.convert_student import (_perm,
                                                 from_minkowski_state_dict,
                                                 to_minkowski_state_dict)
from dropclip_tpu.sparse.unet import UNET_ARCHS, MinkUNet

ARCH = "tiny"


# tiny_bn exercises the Bottleneck branch (conv3, expansion-4 widths) the
# basic-block arch never touches (ADVICE r3: the docstring's "every
# arch/order" claim was only tested on basic blocks)
@pytest.mark.parametrize("arch", ["tiny", "tiny_bn"])
@pytest.mark.parametrize("order", ["x_fastest", "z_fastest"])
def test_roundtrip(rng, order, arch):
    from test_sparse_topology import make_coords

    from dropclip_tpu.sparse.topology import build_unet_topology

    ARCH = arch
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

    sd = to_minkowski_state_dict(params, stats, arch=ARCH,
                                 offset_order=order)
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
