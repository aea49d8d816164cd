"""Host-side data pipeline: raw readers, processed datasets, augmentation."""


def build_dataset_for(cfg):
    """Dataset dispatch on cfg.dataset (the reference hardwires imports —
    tools/train_distil.py:29 imports the REGRAD dataset even for the
    Blender config, SURVEY §2.2; here the config decides)."""
    name = (cfg.dataset or "DistilBlender").lower()
    if "regrad" in name:
        from .dataset_regrad import build_dataset

        return build_dataset(cfg)
    from .dataset_blender import build_dataset

    return build_dataset(cfg)
