"""Single-host multi-device ingest (tools/preprocess_data.py
``--n-devices``): scenes round-robin over ``jax.local_devices()`` via
worker threads, each with a parameter replica pinned by
``ClipExtractor.on_device``. The TPU-native counterpart of the
reference's spawn-Pool CUDA-process parallelism
(reference tools/preprocess_data.py:728-730).

Runs on the 8 virtual CPU devices from conftest; asserts the
multi-device output h5s match the sequential path's.
"""

import argparse
import os

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')


def _args(out: str, n_devices: int) -> argparse.Namespace:
    return argparse.Namespace(
        out=out, split="train", n_scenes=3, n_views=3, voxel_size=0.02,
        batch_size=8, clip_model="tiny-test", clip_checkpoint="random",
        visual_prompt="crop-mask", crop_num_levels=1,
        crop_expansion_ratio=0.15, n_devices=n_devices)


def _read_all(out: str):
    scenes = {}
    split_dir = os.path.join(out, "train")
    for sid in sorted(os.listdir(split_dir)):
        path = os.path.join(split_dir, sid, f"{sid}.h5py")
        with h5py.File(path, "r") as f:
            scenes[sid] = {
                k2: np.asarray(f[k1][k2])
                for k1 in f for k2 in f[k1]
            }
    return scenes


def test_multidevice_ingest_matches_sequential(tmp_path):
    import jax

    from dropclip_tpu.tools.preprocess_data import run_synthetic

    assert jax.device_count() >= 2, "conftest should force 8 CPU devices"
    seq, par = str(tmp_path / "seq"), str(tmp_path / "par")
    run_synthetic(_args(seq, n_devices=1))
    run_synthetic(_args(par, n_devices=2))

    a, b = _read_all(seq), _read_all(par)
    assert a.keys() == b.keys() and len(a) == 3
    for sid in a:
        assert a[sid].keys() == b[sid].keys()
        for key in a[sid]:
            np.testing.assert_array_equal(
                a[sid][key], b[sid][key],
                err_msg=f"{sid}/{key} differs between 1- and 2-device runs")


def test_on_device_replica_isolated():
    """on_device returns a view whose variables live on the target device
    and whose jitted callables are shared (no re-trace per replica)."""
    import jax

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.tools.preprocess_data import build_extractor

    ex = build_extractor(CfgNode(dict(
        clip_model="tiny-test", clip_checkpoint="random",
        visual_prompt="crop-mask", crop_num_levels=1,
        crop_expansion_ratio=0.15, batch_size=8)))
    dev = jax.local_devices()[1]
    rep = ex.on_device(dev)
    leaf = jax.tree_util.tree_leaves(rep.variables)[0]
    assert list(leaf.devices())[0] == dev
    assert rep._obj_prior_view is ex._obj_prior_view
    # original untouched
    leaf0 = jax.tree_util.tree_leaves(ex.variables)[0]
    assert list(leaf0.devices())[0] != dev
