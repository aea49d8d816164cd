"""Processed-scene HDF5 schema (read/write).

Byte-compatible with the reference's preprocessing output
(reference tools/preprocess_data.py:285-297): one ``{scene_id}.h5py`` per
scene containing

  multiview/per_obj       (K, C)  f32   fused per-object CLIP features
  multiview/obj_ids       (K,)    u8    object ids (== row index)
  multiview/objects_info  str           python-literal object metadata
  pointcloud/xyz          (N, 3)  f32
  pointcloud/rgb          (N, 3)  f32   0..1
  pointcloud/label        (N,)    u8    instance ids (0 = table)
  pointcloud/vis_mask     (V, N)  f32   per-view point visibility

so datasets processed by either pipeline interoperate.
"""

from __future__ import annotations

import os
from ast import literal_eval
from typing import Dict, NamedTuple

import h5py
import numpy as np


class ProcessedScene(NamedTuple):
    xyz: np.ndarray
    rgb: np.ndarray
    label: np.ndarray
    vis_mask: np.ndarray       # (V, N) bool
    obj_feats: np.ndarray      # (K, C)
    obj_ids: np.ndarray        # (K,)
    objects_info: Dict


def write_scene(path: str, xyz: np.ndarray, rgb: np.ndarray,
                label: np.ndarray, vis_mask: np.ndarray,
                obj_feats: np.ndarray, objects_info: Dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # atomic: the ingest CLIs resume by skipping existing files, so a
    # crash mid-write must not leave a truncated h5 that is then skipped
    # forever — write to a tmp name and rename into place
    tmp = path + ".tmp"
    _write_scene_to(tmp, xyz, rgb, label, vis_mask, obj_feats, objects_info)
    os.replace(tmp, path)


def _write_scene_to(path: str, xyz, rgb, label, vis_mask, obj_feats,
                    objects_info) -> None:
    with h5py.File(path, "w") as f:
        mv = f.create_group("multiview")
        mv.create_dataset("per_obj", data=np.asarray(obj_feats, np.float32))
        mv.create_dataset("obj_ids", data=np.arange(len(obj_feats)),
                          dtype="uint8")
        mv.create_dataset("objects_info", data=str(objects_info))
        pc = f.create_group("pointcloud")
        pc.create_dataset("xyz", data=np.asarray(xyz, np.float32))
        pc.create_dataset("rgb", data=np.asarray(rgb, np.float32))
        pc.create_dataset("label", data=np.asarray(label), dtype="uint8")
        pc.create_dataset("vis_mask",
                          data=np.asarray(vis_mask, np.float32))


def read_scene(path: str) -> ProcessedScene:
    with h5py.File(path, "r") as f:
        obj_info = f["multiview"]["objects_info"][()]
        if isinstance(obj_info, bytes):
            obj_info = obj_info.decode("utf-8")
        return ProcessedScene(
            xyz=f["pointcloud"]["xyz"][:],
            rgb=f["pointcloud"]["rgb"][:],
            label=f["pointcloud"]["label"][:].astype(np.int32),
            vis_mask=f["pointcloud"]["vis_mask"][:].astype(np.uint8).astype(bool)
            if "vis_mask" in f["pointcloud"] else None,
            obj_feats=f["multiview"]["per_obj"][:],
            obj_ids=f["multiview"]["obj_ids"][:].astype(np.int32),
            objects_info=literal_eval(obj_info),
        )
