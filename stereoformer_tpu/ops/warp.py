"""Disparity warping (NHWC).

Reference semantics: ``utils/disparity_warper.py:48-115`` — warp the right
image to the left view by sampling at x − disp with border padding along x,
plus a validity mask from sampling a ones-image with zeros padding.

Deviation (deliberate, documented): the reference normalises coordinates
with (W−1) but calls ``F.grid_sample`` with its default
``align_corners=False``, which silently rescales the sample point to
x·W/(W−1) − 0.5 — a half-pixel skew that grows across the image.  We sample
at exactly x − disp (the mathematically intended location).  Models here
are trained from scratch, so the learned layers absorb the (tiny)
difference; tests pin *our* semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sample_x(img: jnp.ndarray, x: jnp.ndarray, border: bool) -> jnp.ndarray:
    """Bilinear sample along W at continuous coords x [B,H,W]; img NHWC."""
    W = img.shape[2]
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    t = (x - x0.astype(x.dtype))[..., None]
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    # gather per-row: img [B,H,W,C], idx [B,H,W] -> [B,H,W,C]
    v0 = jnp.take_along_axis(img, x0c[..., None], axis=2)
    v1 = jnp.take_along_axis(img, x1c[..., None], axis=2)
    out = v0 * (1 - t) + v1 * t
    if not border:
        w0 = jnp.where((x0 >= 0) & (x0 <= W - 1), 1.0, 0.0)
        w1 = jnp.where((x1 >= 0) & (x1 <= W - 1), 1.0, 0.0)
        out = v0 * (1 - t) * w0[..., None] + v1 * t * w1[..., None]
    return out


def disp_warp(img: jnp.ndarray, disp: jnp.ndarray, padding_mode: str = "border"):
    """Warp ``img`` (the right view, NHWC [B,H,W,C]) by positive disparity
    ``disp`` [B,H,W,1]: out(x) = img(x − disp(x)).

    Returns (warped [B,H,W,C], valid_mask [B,H,W,1] ∈ {0,1}) where the mask
    is 1 only for pixels whose sample point lies fully inside the image
    (disparity_warper.py:102-105 thresholding at 0.9999).
    """
    B, H, W, C = img.shape
    x = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    sx = x - disp[..., 0]                               # [B,H,W]
    warped = _sample_x(img, sx, border=(padding_mode == "border"))
    ones = jnp.ones((B, H, W, 1), img.dtype)
    wmask = _sample_x(ones, sx, border=False)
    valid = (wmask >= 0.9999).astype(img.dtype)
    return warped, valid


def lr_warp_error(
    img_left: jnp.ndarray, disp: jnp.ndarray, img_right: jnp.ndarray
) -> jnp.ndarray:
    """imgR − warp(imgL, disp) at the disparity's resolution
    (disparity_warper.py:109-115)."""
    from .resize import resize_bilinear

    H, W = disp.shape[1:3]
    if img_left.shape[2] > W:
        img_left = resize_bilinear(img_left, (H, W), align_corners=False)
    if img_right.shape[2] > W:
        img_right = resize_bilinear(img_right, (H, W), align_corners=False)
    warped, _ = disp_warp(img_left, disp)
    return img_right - warped
