"""Pinhole camera model (reference utils/projections.py:16-37)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp


@dataclass(frozen=True)
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 640
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.asarray(
            [[self.fx, 0.0, self.cx],
             [0.0, self.fy, self.cy],
             [0.0, 0.0, 1.0]], dtype=jnp.float32)

    @classmethod
    def from_dict(cls, d: Dict[str, float], width: int = 640, height: int = 480):
        return cls(fx=float(d["fx"]), fy=float(d["fy"]),
                   cx=float(d["cx"]), cy=float(d["cy"]),
                   width=width, height=height)

    @classmethod
    def mvtod(cls, base_scale: float = 10.0):
        """MV-TOD / Blender intrinsics: fx=fy=444.44·(base_scale/10), 640x480
        (reference data/blender.py:180-187)."""
        f = 444.44444444 * (base_scale / 10.0)
        return cls(fx=f, fy=f, cx=319.5, cy=239.5, width=640, height=480)

    def scale(self, sx: float, sy: float) -> "CameraIntrinsics":
        return CameraIntrinsics(
            fx=self.fx * sx, fy=self.fy * sy,
            cx=self.cx * sx, cy=self.cy * sy,
            width=int(round(self.width * sx)), height=int(round(self.height * sy)))
