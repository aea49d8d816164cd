"""Image/feature-map resizing with torch ``F.interpolate`` parity.

The reference relies on torch bicubic interpolation in two numerically
sensitive places: CLIP positional-embedding interpolation for non-square
inputs (reference models/features/clip/interpolate.py:5-54) and multi-view
feature-map upsampling inside fusion (reference utils/feature_fusion.py:
167-172). ``jax.image.resize`` uses a different cubic kernel (Keys a=-0.5)
and coordinate convention, so we implement torch's exactly:

- cubic convolution kernel with a = -0.75,
- half-pixel coordinate mapping ``src = (dst + 0.5) / scale - 0.5``,
- border clamping, no antialiasing (torch default for upsampling),
- optional explicit ``scale`` override matching
  ``recompute_scale_factor=False`` semantics (the DINO-style +0.1 trick
  passes a scale that is NOT out_size/in_size).

Separable over H then W; pure gather + weighted sum, jit/vmap friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def _cubic_weights(frac: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Weights of the 4 taps at distances (1+f, f, 1-f, 2-f). frac: (N,)."""

    def w1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def w2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    d0 = 1.0 + frac
    d1 = frac
    d2 = 1.0 - frac
    d3 = 2.0 - frac
    return jnp.stack([w2(d0), w1(d1), w1(d2), w2(d3)], axis=-1)  # (N, 4)


def _linear_weights(frac: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([1.0 - frac, frac], axis=-1)  # (N, 2)


def _axis_taps(in_size: int, out_size: int, scale: Optional[float],
               kind: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tap indices (out, T) and weights (out, T) for one axis."""
    s = float(scale) if scale is not None else out_size / in_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) / s - 0.5
    i0 = jnp.floor(src)
    frac = src - i0
    i0 = i0.astype(jnp.int32)
    if kind == "cubic":
        weights = _cubic_weights(frac)
        offs = jnp.arange(-1, 3, dtype=jnp.int32)
    else:
        weights = _linear_weights(frac)
        offs = jnp.arange(0, 2, dtype=jnp.int32)
    idx = jnp.clip(i0[:, None] + offs[None, :], 0, in_size - 1)
    return idx, weights


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int,
                 scale: Optional[float], kind: str) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size and (scale is None or abs(scale - 1.0) < 1e-12):
        return x
    idx, w = _axis_taps(in_size, out_size, scale, kind)
    taps = jnp.take(x, idx.reshape(-1), axis=axis)
    new_shape = (x.shape[:axis] + (out_size, idx.shape[1])
                 + x.shape[axis + 1:])
    taps = taps.reshape(new_shape)
    wshape = [1] * taps.ndim
    wshape[axis] = out_size
    wshape[axis + 1] = idx.shape[1]
    return jnp.sum(taps * w.reshape(wshape).astype(x.dtype), axis=axis + 1)


def _resize(x: jnp.ndarray, out_hw: Sequence[int],
            scale_hw: Optional[Sequence[float]], kind: str,
            h_axis: int, w_axis: int) -> jnp.ndarray:
    sh, sw = (scale_hw if scale_hw is not None else (None, None))
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    x = _resize_axis(x, h_axis, int(out_hw[0]), sh, kind)
    x = _resize_axis(x, w_axis, int(out_hw[1]), sw, kind)
    return x.astype(orig_dtype)


def bicubic_resize(x: jnp.ndarray, out_hw: Sequence[int],
                   scale_hw: Optional[Sequence[float]] = None,
                   channel_last: bool = True) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bicubic', align_corners=False)`` parity.

    x: (..., H, W, C) if channel_last else (..., H, W). ``scale_hw``
    overrides the coordinate-mapping scale (recompute_scale_factor=False).
    """
    if channel_last:
        h_axis, w_axis = x.ndim - 3, x.ndim - 2
    else:
        h_axis, w_axis = x.ndim - 2, x.ndim - 1
    return _resize(x, out_hw, scale_hw, "cubic", h_axis, w_axis)


def bilinear_resize(x: jnp.ndarray, out_hw: Sequence[int],
                    scale_hw: Optional[Sequence[float]] = None,
                    channel_last: bool = True) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` parity."""
    if channel_last:
        h_axis, w_axis = x.ndim - 3, x.ndim - 2
    else:
        h_axis, w_axis = x.ndim - 2, x.ndim - 1
    return _resize(x, out_hw, scale_hw, "linear", h_axis, w_axis)


def bicubic_sample_at(src: jnp.ndarray, out_hw: Sequence[int],
                      px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Value of ``bicubic_resize(src, out_hw)[py, px]`` WITHOUT materializing
    the resized map.

    The reference upsamples every (ph, pw, C) teacher feature map to the
    full (H, W, C) image (~1 GB/view at 768-d) and then reads it at the N
    projected point pixels (utils/feature_fusion.py:167-172, 233-240).
    Sampling the interpolant at just those pixels is mathematically
    identical: per point, a 4x4 tap neighborhood with torch's cubic weights.

    src: (ph, pw, C); px/py: (N,) integer output-pixel coords in
    [0, W) x [0, H). Returns (N, C) float32.
    """
    ph, pw = src.shape[0], src.shape[1]
    H, W = int(out_hw[0]), int(out_hw[1])
    src_f = src.astype(jnp.float32)

    def axis_taps(coord, out_size, in_size):
        s = (coord.astype(jnp.float32) + 0.5) * (in_size / out_size) - 0.5
        i0 = jnp.floor(s)
        frac = s - i0
        idx = jnp.clip(i0.astype(jnp.int32)[:, None]
                       + jnp.arange(-1, 3, dtype=jnp.int32)[None, :],
                       0, in_size - 1)
        return idx, _cubic_weights(frac)  # (N,4), (N,4)

    iy, wy = axis_taps(py, H, ph)
    ix, wx = axis_taps(px, W, pw)
    # gather (N, 4, 4, C): rows by iy, cols by ix
    flat = src_f.reshape(ph * pw, -1)
    lin = iy[:, :, None] * pw + ix[:, None, :]  # (N, 4, 4)
    taps = jnp.take(flat, lin.reshape(lin.shape[0], -1), axis=0)
    taps = taps.reshape(lin.shape[0], 4, 4, -1)
    w = (wy[:, :, None] * wx[:, None, :])[..., None]  # (N, 4, 4, 1)
    return jnp.sum(taps * w, axis=(1, 2))
