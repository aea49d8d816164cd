"""Serving export: serialize the grounding program, reload WITHOUT the
model code path, run, and compare to the live program."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (fast gate: -m 'not slow')

TINY = ["voxel_capacity", "256", "feat_dim", "16", "arch_3d", "MinkUNet14A",
        "planes", "[4,4,8,8,8,8,4,4]", "layers", "[1,1,1,1,1,1,1,1]",
        "init_dim", "4", "brick_capacities", "[64,64,64,64,64]",
        "brick_shape", "[4,4,2]"]


def _tiny_cfg():
    from dropclip_tpu.core.config import (load_cfg_from_cfg_file,
                                          merge_cfg_from_list)

    cfg = load_cfg_from_cfg_file("configs/DistilBlender.yaml")
    return merge_cfg_from_list(cfg, list(TINY))


def test_export_roundtrip_matches_live(tmp_path):
    import jax

    from dropclip_tpu.serve import load_exported
    from dropclip_tpu.tools.export_model import (build_serve_fn,
                                                 example_inputs,
                                                 export_serve)

    cfg = _tiny_cfg()
    # random skeleton weights, same path the CLI's --random-init takes
    import argparse

    from dropclip_tpu.tools.export_model import _load_variables

    variables = _load_variables(
        argparse.Namespace(random_init=True, ckpt_dir=None,
                           ckpt_name=""), cfg)
    path = str(tmp_path / "m.jaxexp")
    exported = export_serve(cfg, variables, path, nq=2, nneg=3,
                            platforms=["cpu"])
    assert list(exported.platforms) == ["cpu"]

    run = load_exported(path)
    inputs = example_inputs(cfg, nq=2, nneg=3, seed=1)
    masks, sims, dropped = run(*inputs)
    want = jax.jit(build_serve_fn(cfg, variables, 2, 3))(*inputs)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(want[0]))
    np.testing.assert_allclose(np.asarray(sims), np.asarray(want[1]),
                               rtol=2e-5, atol=2e-5)
    assert masks.shape == (2, 256)
    assert int(dropped) == int(want[2])


def test_export_cli(tmp_path, capsys):
    from dropclip_tpu.tools.export_model import main

    out = str(tmp_path / "cli.jaxexp")
    rc = main(["--config", "configs/DistilBlender.yaml", "--random-init",
               "--out", out, "--nq", "2", "--nneg", "3",
               "--platforms", "cpu", "--check", "--opts"] + TINY)
    assert rc == 0
    assert "roundtrip check ok" in capsys.readouterr().out
