"""Input padding and misc RAFT utilities.

Reference: ``models/IterativeLocalCostVolume/utils/utils.py:7-96`` —
InputPadder (pad images to a multiple of 8/2^d), forward_interpolate
(warp-forward a flow field between frames), gauss_blur.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class InputPadder:
    """Pad NHWC images so H, W are multiples of ``divisor``
    (utils.py:7-27: 'sintel' mode splits height padding top+bottom;
    default mode puts all height padding at the BOTTOM — F.pad order is
    (left, right, top, bottom) and the reference passes [.., .., 0,
    pad_ht])."""

    def __init__(self, shape, divisor: int = 8, mode: str = "default"):
        self.ht, self.wd = shape[-3], shape[-2]
        pad_ht = (((self.ht // divisor) + 1) * divisor - self.ht) % divisor
        pad_wd = (((self.wd // divisor) + 1) * divisor - self.wd) % divisor
        if mode == "sintel":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2)
        else:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    def pad(self, *inputs):
        l, r, t, b = self._pad
        out = [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
            for x in inputs
        ]
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        l, r, t, b = self._pad
        H, W = x.shape[-3], x.shape[-2]
        return x[..., t : H - b if b else H, l : W - r if r else W, :]


def gauss_blur(x: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """Separable Gaussian blur on NHWC images (utils.py gauss_blur)."""
    r = kernel_size // 2
    g = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
    g = (g / g.sum()).astype(np.float32)
    kh = jnp.asarray(g)[None, :, None, None]  # [1, k, 1, 1]
    kv = jnp.asarray(g)[:, None, None, None]
    C = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def dw(x, k):
        return jax.lax.conv_general_dilated(
            x, jnp.tile(k, (1, 1, 1, C)).reshape(k.shape[0], k.shape[1], 1, C),
            (1, 1), "SAME", dimension_numbers=dn, feature_group_count=C,
        )

    return dw(dw(x, kh), kv)


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """Forward-warp a [H, W, 2] flow field to the next frame by splatting
    then nearest-neighbour filling (utils.py:30-55; the reference uses
    scipy griddata — here a numpy splat, host-side only, used to warm-start
    ``flow_init`` between video frames)."""
    H, W = flow.shape[:2]
    dx, dy = flow[..., 0], flow[..., 1]
    y0, x0 = np.mgrid[:H, :W]
    x1 = np.round(x0 + dx).astype(np.int64)
    y1 = np.round(y0 + dy).astype(np.int64)
    ok = (x1 >= 0) & (x1 < W) & (y1 >= 0) & (y1 < H)
    out = np.zeros_like(flow)
    cnt = np.zeros((H, W, 1), np.float32)
    np.add.at(out, (y1[ok], x1[ok]), flow[ok])
    np.add.at(cnt, (y1[ok], x1[ok]), 1.0)
    filled = cnt[..., 0] > 0
    out[filled] /= cnt[filled]
    return out
