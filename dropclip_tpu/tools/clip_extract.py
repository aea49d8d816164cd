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
import os

import numpy as np


def patchify_image(image: np.ndarray, crop_size: int, tile: int):
    """Center-crop to ``crop_size`` and split into a (crop/tile)^2 grid of
    tiles (reference tools/extract_multiview_features.py:191-203 — the
    legacy hi-res path that runs EACH TILE through CLIP as a full image
    and uses the per-tile cls embedding as a coarse dense feature map)."""
    assert crop_size % tile == 0, (crop_size, tile)
    h, w = image.shape[:2]
    assert crop_size <= min(h, w), (
        f"crop_size {crop_size} exceeds image {h}x{w}; pass --crop-size "
        f"<= {min(h, w)} (a multiple of tile={tile})")
    sx = h // 2 - crop_size // 2
    sy = w // 2 - crop_size // 2
    c = image[sx: sx + crop_size, sy: sy + crop_size]
    g = crop_size // tile
    tiles = (c.reshape(g, tile, g, tile, 3).swapaxes(1, 2)
             .reshape(-1, tile, tile, 3))
    return tiles, c


def extract_tiled(ex, image: np.ndarray, crop_size: int, tile: int,
                  batch_size: int = 64) -> np.ndarray:
    """(H, W, 3) -> (crop/tile, crop/tile, C) tiled cls-feature map
    (reference extract_multiview_features.py CLIPFeatures.extract)."""
    tiles, _ = patchify_image(image, crop_size, tile)
    ex.set_mode("cls")
    feats = [np.asarray(ex.extract(tiles[i: i + batch_size]))
             for i in range(0, len(tiles), batch_size)]
    g = crop_size // tile
    return np.concatenate(feats).reshape(g, g, -1)


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu CLIP feature extraction")
    p.add_argument("--images", required=True, help="glob of image files")
    p.add_argument("--out", required=True)
    p.add_argument("--clip-model", default="ViT-L/14@336px")
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--mode", choices=["cls", "patch", "tiled"],
                   default="patch")
    p.add_argument("--crop-size", type=int, default=448,
                   help="tiled mode: center-crop edge")
    p.add_argument("--tile", type=int, default=32,
                   help="tiled mode: tile edge (crop-size % tile == 0)")
    p.add_argument("--batch-size", type=int, default=16)
    a = p.parse_args()

    from dropclip_tpu.core.config import CfgNode
    from dropclip_tpu.tools.preprocess_data import build_extractor

    ex = build_extractor(CfgNode(dict(
        clip_model=a.clip_model, clip_checkpoint=a.clip_checkpoint,
        visual_prompt="crop-mask", crop_num_levels=1,
        crop_expansion_ratio=0.15, batch_size=a.batch_size)))
    from .dino_extract import _list_images, _read_rgb

    files = _list_images(a.images)
    os.makedirs(a.out, exist_ok=True)

    if a.mode == "tiled":
        for i, f in enumerate(files):
            feat = extract_tiled(ex, _read_rgb(f), a.crop_size, a.tile,
                                 a.batch_size)
            name = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(a.out, f"{name}.npy"), feat)
            print(f"{i + 1}/{len(files)}")
        return

    ex.set_mode(a.mode)
    for i in range(0, len(files), a.batch_size):
        chunk = files[i: i + a.batch_size]
        imgs = np.stack([_read_rgb(f) for f in chunk])
        feats = np.asarray(ex.extract(imgs))
        for f, feat in zip(chunk, feats):
            name = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(a.out, f"{name}.npy"), feat)
        print(f"{i + len(chunk)}/{len(files)}")


if __name__ == "__main__":
    main()
