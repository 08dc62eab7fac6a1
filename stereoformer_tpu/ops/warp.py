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

TPU note: the per-pixel ``take_along_axis`` lowered to a serialized gather
costing 18% of the flagship forward (profiled); the default path is the
gather-free padded one-hot + two shifted reductions (the same
transformation as the cost-volume band and corr-pyramid lookup).  The
validity mask is computed analytically — bilinear sampling of a
ones-image with zeros padding thresholded at 0.9999 is exactly
``0 ≤ x−disp ≤ W−1``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sample_x_gather(img: jnp.ndarray, x: jnp.ndarray, border: bool) -> jnp.ndarray:
    """Gather reference: bilinear sample along W at coords x [B,H,W]."""
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


def _sample_x_onehot(img: jnp.ndarray, x: jnp.ndarray, border: bool) -> jnp.ndarray:
    """Gather-free bilinear sample along W (one-hot of floor(x) contracted
    with the row and its shift — exact match of the gather path)."""
    B, H, W, C = img.shape
    if border:
        # where-based clamp (grad 1 at the boundary values themselves,
        # matching the gather path's clamped-index gradient exactly)
        x = jnp.where(x < 0.0, 0.0, jnp.where(x > W - 1.0, W - 1.0, x))
    x0 = jnp.floor(x)
    t = (x - x0)[..., None]                              # [B,H,W,1]
    # padded one-hot so bases in [-1, W] are representable
    P = 1
    v = jnp.arange(W + 2 * P) - P
    onehot = (x0[..., None] == v).astype(img.dtype)      # [B,H,W,W+2]
    # border mode pads with EDGE values (tap x0+1 at the top edge must be
    # the clamped img[W−1], as the gather path returns); zeros otherwise
    pad_mode = "edge" if border else "constant"
    big = jnp.pad(img, ((0, 0), (0, 0), (P + 1, P + 1), (0, 0)), mode=pad_mode)
    # tap k: big_slice[v'] = img[v' − P + k]
    v0 = jnp.einsum("bhwv,bhvc->bhwc", onehot, big[:, :, 1 : 1 + W + 2 * P])
    v1 = jnp.einsum("bhwv,bhvc->bhwc", onehot, big[:, :, 2 : 2 + W + 2 * P])
    return v0 * (1 - t) + v1 * t


def _sample_x(img, x, border: bool, impl: str = "onehot"):
    if impl == "gather":
        return _sample_x_gather(img, x, border)
    return _sample_x_onehot(img, x, border)


def disp_warp(
    img: jnp.ndarray, disp: jnp.ndarray, padding_mode: str = "border",
    impl: str = "onehot",
):
    """Warp ``img`` (the right view, NHWC [B,H,W,C]) by positive disparity
    ``disp`` [B,H,W,1]: out(x) = img(x − disp(x)).

    Returns (warped [B,H,W,C], valid_mask [B,H,W,1] ∈ {0,1}) where the mask
    is 1 only for pixels whose sample point lies fully inside the image
    (disparity_warper.py:102-105 thresholding at 0.9999 ⇔
    0 ≤ x−disp ≤ W−1, computed analytically).
    """
    B, H, W, C = img.shape
    x = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    sx = x - disp[..., 0]                               # [B,H,W]
    warped = _sample_x(img, sx, border=(padding_mode == "border"), impl=impl)
    valid = ((sx >= 0) & (sx <= W - 1)).astype(img.dtype)[..., None]
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
