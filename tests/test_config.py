import textwrap

from dropclip_tpu.core.config import CfgNode, load_cfg, merge_cfg_from_list


def test_load_flattens_sections(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(textwrap.dedent("""
        DATA:
          voxel_size: 0.05
          use_color: True
        MODEL:
          arch_3d: MinkUNet14D
          batch_size: 8
        Distributed:
          world_size: 1
    """))
    cfg = load_cfg(str(p))
    assert cfg.voxel_size == 0.05
    assert cfg.use_color is True
    assert cfg.arch_3d == "MinkUNet14D"
    assert cfg.world_size == 1


def test_missing_attr_is_none():
    cfg = CfgNode({"a": 1})
    assert cfg.nonexistent_flag is None
    assert not cfg.nonexistent_flag


def test_merge_opts_coerces_types():
    cfg = CfgNode({"batch_size": 8, "base_lr": 0.0003, "arch_3d": "MinkUNet14D",
                   "use_color": True})
    out = merge_cfg_from_list(
        cfg, ["batch_size", "16", "base_lr", "0.001", "arch_3d", "MinkUNet18A",
              "use_color", "False", "new_key", "[1,2]"])
    assert out.batch_size == 16 and isinstance(out.batch_size, int)
    assert abs(out.base_lr - 0.001) < 1e-12
    assert out.arch_3d == "MinkUNet18A"
    assert out.use_color is False
    assert out.new_key == [1, 2]
    # original untouched
    assert cfg.batch_size == 8
