"""Batch dense CLIP patch-feature extraction for image folders.

Counterpart of reference tools/clip_extract.py:25-83: load images, run
the MaskCLIP patch path at [336, 448] without center crop, save (h, w, C)
feature maps as .npy.

Usage:
  python -m dropclip_tpu.tools.clip_extract --images "DIR/*.png" --out OUT \
      [--clip-checkpoint clip.pt] [--mode patch|cls]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser("dropclip_tpu CLIP feature extraction")
    p.add_argument("--images", required=True, help="glob of image files")
    p.add_argument("--out", required=True)
    p.add_argument("--clip-model", default="ViT-L/14@336px")
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--mode", choices=["cls", "patch"], default="patch")
    p.add_argument("--batch-size", type=int, default=16)
    a = p.parse_args()

    import cv2

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.tools.preprocess_data import build_extractor

    ex = build_extractor(CfgNode(dict(
        clip_model=a.clip_model, clip_checkpoint=a.clip_checkpoint,
        visual_prompt="crop-mask", crop_num_levels=1,
        crop_expansion_ratio=0.15, batch_size=a.batch_size)))
    ex.set_mode(a.mode)

    files = sorted(glob.glob(a.images))
    assert files, f"no images match {a.images}"
    os.makedirs(a.out, exist_ok=True)
    for i in range(0, len(files), a.batch_size):
        chunk = files[i: i + a.batch_size]
        imgs = np.stack([
            np.ascontiguousarray(cv2.imread(f)[:, :, ::-1]) for f in chunk])
        feats = np.asarray(ex.extract(imgs))
        for f, feat in zip(chunk, feats):
            name = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(a.out, f"{name}.npy"), feat)
        print(f"{i + len(chunk)}/{len(files)}")


if __name__ == "__main__":
    main()
