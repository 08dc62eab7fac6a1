"""Bilinear resize with explicit align_corners semantics.

The reference mixes ``F.interpolate(align_corners=False)`` (half-pixel
centres), ``nn.UpsamplingBilinear2d`` / ``align_corners=True`` upsampling
(feature_fusion.py:104, upsample.py:41-43), and ``scale_disp``
(dataloader/preprocess.py:257-272).  jax.image.resize only implements the
half-pixel convention, so both are implemented here on top of one gather
based sampler.  NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool, dtype):
    out = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), dtype)
        scale = (in_size - 1) / (out_size - 1)
        return out * scale
    scale = in_size / out_size
    return jnp.clip((out + 0.5) * scale - 0.5, 0.0, in_size - 1)


def _interp_axis(x: jnp.ndarray, coords: jnp.ndarray, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    lo = jnp.clip(lo, 0, in_size - 1)
    t = coords - lo.astype(coords.dtype)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = coords.shape[0]
    t = t.reshape(shape)
    return x_lo * (1 - t) + x_hi * t


def resize_bilinear(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / NHW1) images to (H, W) = size."""
    H, W = size
    ch = _source_coords(H, x.shape[-3], align_corners, jnp.float32)
    cw = _source_coords(W, x.shape[-2], align_corners, jnp.float32)
    x = _interp_axis(x, ch, axis=x.ndim - 3)
    x = _interp_axis(x, cw, axis=x.ndim - 2)
    return x


def scale_disp(disp: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Resize a disparity map and rescale values by the width ratio
    (reference ``dataloader/preprocess.py:257-272``: bilinear
    align_corners=False resize, then × out_W / in_W).

    disp: [..., H, W, 1] NHWC -> [..., H', W', 1].
    """
    in_w = disp.shape[-2]
    out = resize_bilinear(disp, size, align_corners=False)
    return out * (size[1] / in_w)
