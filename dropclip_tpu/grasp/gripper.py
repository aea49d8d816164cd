"""Procedural gripper marker mesh (pure numpy, no trimesh dependency).

Port of the reference's parallel-yaw marker — four cylinders: base stick,
cross bar, two fingers (reference gripper_models/__init__.py:9-67 and
data/blender.py:124-162) — built from explicit cylinder vertices/faces.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _cylinder(p0: np.ndarray, p1: np.ndarray, radius: float = 0.002,
              sections: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """Capless cylinder between two 3D points -> (verts (2S, 3), faces)."""
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    z = axis / max(length, 1e-12)
    a = np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 else np.array([0, 1.0, 0])
    x = np.cross(z, a)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    ang = np.linspace(0, 2 * np.pi, sections, endpoint=False)
    ring = (np.outer(np.cos(ang), x) + np.outer(np.sin(ang), y)) * radius
    verts = np.concatenate([p0 + ring, p1 + ring])
    faces = []
    for i in range(sections):
        j = (i + 1) % sections
        faces.append([i, j, sections + i])
        faces.append([j, sections + j, sections + i])
    return verts, np.asarray(faces, np.int32)


# reference gripper_models/__init__.py:9-67 segment endpoints
_SEGMENTS = [
    ([4.10000000e-02, 0, 6.59999996e-02], [4.10000000e-02, 0, 1.12169998e-01]),
    ([-4.1e-02, 0, 6.59999996e-02], [-4.1e-02, 0, 1.12169998e-01]),
    ([0, 0, 0], [0, 0, 6.59999996e-02]),
    ([-4.1e-02, 0, 6.59999996e-02], [4.1e-02, 0, 6.59999996e-02]),
]


def create_gripper_marker(radius: float = 0.002, sections: int = 6
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel-yaw gripper marker -> (verts (V, 3), faces (F, 3))."""
    all_v, all_f = [], []
    off = 0
    for p0, p1 in _SEGMENTS:
        v, f = _cylinder(np.array(p0), np.array(p1), radius, sections)
        all_v.append(v)
        all_f.append(f + off)
        off += len(v)
    return np.concatenate(all_v), np.concatenate(all_f)


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal OBJ export for visualization."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
