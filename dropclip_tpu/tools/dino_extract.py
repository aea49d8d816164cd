"""Batch DINO descriptor extraction for image folders.

Counterpart of reference tools/dino_extract.py:34-71 (DINOv2 featurizer:
cls or patch tokens) and of the standalone hi-res DINO v1 extractor CLI
(reference models/features/dino/dino_vit_extractor.py:338-364:
stride-patched ViT, facet descriptors, optional log binning). Saves one
.npy per image.

Usage:
  python -m dropclip_tpu.tools.dino_extract --images "DIR/*.png" --out OUT \
      [--model dinov2_vits14] [--checkpoint hf_dinov2.pt] [--mode patch]
  python -m dropclip_tpu.tools.dino_extract --images ... --out OUT \
      --model dino_vits8 --stride 4 --facet key --layer 11 [--bin] \
      [--load-size 224] [--checkpoint dino_vits8.pt]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _list_images(pattern: str):
    if os.path.isdir(pattern):  # accept a directory as shorthand for dir/*
        pattern = os.path.join(pattern, "*")
    files = [f for f in sorted(glob.glob(pattern)) if os.path.isfile(f)]
    assert files, f"no images match {pattern}"
    return files


def _read_rgb(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(path)
    assert im is not None, f"unreadable image file: {path}"
    return np.ascontiguousarray(im[:, :, ::-1])


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    p = argparse.ArgumentParser("dropclip_tpu DINOv2 feature extraction")
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="dinov2_vits14")
    p.add_argument("--checkpoint", default=None,
                   help="HuggingFace Dinov2Model state dict (.pt); random "
                        "weights if omitted (smoke mode)")
    p.add_argument("--mode", choices=["cls", "patch"], default="patch")
    p.add_argument("--resize", type=int, nargs=2, default=(336, 448))
    p.add_argument("--batch-size", type=int, default=16)
    # hi-res DINO v1 options (reference dino_vit_extractor.py:338-353)
    p.add_argument("--stride", type=int, default=4,
                   help="patch-conv stride for dino_vits/vitb models")
    p.add_argument("--facet", default="key",
                   choices=["key", "query", "value", "token"])
    p.add_argument("--layer", type=int, default=11)
    p.add_argument("--bin", action="store_true",
                   help="log-binned descriptors")
    p.add_argument("--load-size", type=int, default=224)
    p.add_argument("--family", choices=["auto", "dinov2", "dino_v1"],
                   default="auto")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    # hi-res DINO v1 / timm models take the stride-patched path; dinov2
    # (and, by default, the shared "tiny-test" smoke config) use the
    # featurizer below
    if a.family == "dino_v1" or (
            a.family == "auto" and a.model.startswith(("dino_vit", "vit_"))):
        return _main_dino_v1(a)

    from dropclip_tpu.teachers.dinov2 import (Dinov2Extractor, build_dinov2,
                                              from_hf_dinov2)

    model = build_dinov2(a.model, dtype=jnp.bfloat16)
    if a.checkpoint:
        import torch

        obj = torch.load(a.checkpoint, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        variables = {"params": from_hf_dinov2(sd)}
    else:
        print("WARNING: no --checkpoint; RANDOM weights (smoke mode)")
        px = jnp.zeros((1, model.image_resolution, model.image_resolution, 3))
        variables = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x))(px)

    ex = Dinov2Extractor(model, variables, mode=a.mode,
                         img_resize=tuple(a.resize), batch_size=a.batch_size)
    files = _list_images(a.images)
    os.makedirs(a.out, exist_ok=True)
    for i in range(0, len(files), a.batch_size):
        chunk = files[i: i + a.batch_size]
        imgs = np.stack([_read_rgb(f) for f in chunk])
        feats = np.asarray(ex.extract(imgs))
        for f, feat in zip(chunk, feats):
            name = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(a.out, f"{name}.npy"), feat)
        print(f"{i + len(chunk)}/{len(files)}")


def _main_dino_v1(a) -> None:
    """Hi-res stride-patched descriptor path (reference
    dino_vit_extractor.py:356-364)."""
    from dropclip_tpu.teachers.dino_v1 import ViTExtractor, from_dino_v1

    variables = None
    if a.checkpoint:
        import torch

        obj = torch.load(a.checkpoint, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        variables = {"params": from_dino_v1(sd)}
    else:
        print("WARNING: no --checkpoint; RANDOM weights (smoke mode)")
    ex = ViTExtractor(a.model, stride=a.stride, variables=variables)
    files = _list_images(a.images)
    os.makedirs(a.out, exist_ok=True)
    for f in files:
        batch = ex.preprocess(_read_rgb(f), load_size=a.load_size)
        desc = ex.extract_descriptors(batch, layer=a.layer, facet=a.facet,
                                      bin=a.bin)
        name = os.path.splitext(os.path.basename(f))[0]
        np.save(os.path.join(a.out, f"{name}.npy"), np.asarray(desc))
        print(f"{name}: descriptors {tuple(desc.shape)}")


if __name__ == "__main__":
    main()
