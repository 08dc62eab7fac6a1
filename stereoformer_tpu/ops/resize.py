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
import numpy as np


def _source_coords(out_size: int, in_size: int, align_corners: bool, dtype):
    out = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), dtype)
        scale = (in_size - 1) / (out_size - 1)
        return out * scale
    scale = in_size / out_size
    return jnp.clip((out + 0.5) * scale - 0.5, 0.0, in_size - 1)


def _interp_matrix(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Static bilinear interpolation matrix M [out, in] with
    out = M @ x along the resized axis — resize coordinates are static, so
    the whole resample is one small matmul (TPU gathers serialize; a
    constant-matrix contraction rides the MXU)."""
    # pure-numpy coordinate math: this runs at TRACE time (shapes are
    # static), so it must not touch jnp
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        coords = (
            np.zeros(1) if out_size == 1
            else out * ((in_size - 1) / (out_size - 1))
        )
    else:
        coords = np.clip((out + 0.5) * (in_size / out_size) - 0.5, 0.0,
                         in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.clip(lo + 1, 0, in_size - 1)
    lo = np.clip(lo, 0, in_size - 1)
    t = coords - lo
    M = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(M, (rows, lo), 1.0 - t)
    np.add.at(M, (rows, hi), t)
    return jnp.asarray(M)


def _interp_axis(x: jnp.ndarray, coords, axis: int, M: jnp.ndarray) -> jnp.ndarray:
    x_moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum(
        "oi,...i->...o", M, x_moved, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / NHW1) images to (H, W) = size."""
    H, W = size
    Mh = _interp_matrix(H, x.shape[-3], align_corners)
    Mw = _interp_matrix(W, x.shape[-2], align_corners)
    x = _interp_axis(x, None, axis=x.ndim - 3, M=Mh)
    x = _interp_axis(x, None, axis=x.ndim - 2, M=Mw)
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
