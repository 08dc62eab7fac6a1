"""Losses and error metrics (pure functions over [B, H, W(, 1)] arrays).

Capability map to the reference (one canonical copy each — the reference
duplicates EPE five times, SURVEY §2.9):

- ``sequence_loss``       — losses/squence_loss.py:6-18 (γ-weighted L1 over
  the GRU output list; note the reference takes the mean over *all*
  pixels of the masked difference — masked-out pixels contribute zeros to
  the denominator — reproduced exactly).
- ``epe``                 — EPE_Loss (masked mean-abs-err, mask 0<gt<192).
- ``smooth_l1_masked``    — torch SmoothL1 (beta=1) over masked pixels.
- ``single_scale_loss``   — losses/single_disp_loss.py:17-47 (auto 8×
  upscale of low-res predictions, values ×scale).
- ``multi_scale_loss``    — losses/multi_disp_loss.py:18-62 (weighted
  smooth-L1 over a prediction list, mask 0<gt<192).
- ``multi_equal_loss``    — losses/multi_equal_loss.py:16-55 (same but
  mask 0<=gt<192, default weights (0.8, 1.2)).
- ``range_and_disparity_loss`` — losses/multi_equal_with_supervised.py:17-68
  (supervised 1/8-scale range loss ×4 + equal loss).
- ``searching_range_loss`` / ``total_loss`` — losses/combination_loss.py:53-124.

Masks use where/sum rather than boolean indexing (static shapes under jit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..ops import resize_bilinear

MAX_DISP = 192.0


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def valid_mask(gt: jnp.ndarray, lo_inclusive: bool = False) -> jnp.ndarray:
    """0<gt<192 (or 0<=gt<192 for the 'equal' losses)."""
    lo = gt >= 0 if lo_inclusive else gt > 0
    return lo & (gt < MAX_DISP)


def epe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Masked end-point error (EPE_Loss, squence_loss.py:22-26)."""
    return _masked_mean(jnp.abs(pred - gt), valid_mask(gt))


def smooth_l1_masked(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return _masked_mean(_smooth_l1(pred - gt), mask)


def sequence_loss(
    preds: Sequence[jnp.ndarray], gt: jnp.ndarray, gamma: float = 0.8
) -> jnp.ndarray:
    """RAFT-style exponentially weighted L1 over the iteration outputs
    (squence_loss.py:6-18).  The per-iteration term is
    mean(|pred·m − gt·m|) over *all* pixels (reference semantics)."""
    n = len(preds)
    m = valid_mask(gt).astype(gt.dtype)
    total = 0.0
    for i, p in enumerate(preds):
        w = gamma ** (n - i - 1)
        total = total + w * jnp.mean(jnp.abs(p * m - gt * m))
    return total


def single_scale_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1; low-res predictions are bilinearly upscaled to gt size
    and values multiplied by the integer width ratio
    (single_disp_loss.py:25-40).  NHWC [B,H,W,1]."""
    if pred.shape[-2] != gt.shape[-2]:
        scale = gt.shape[-2] // pred.shape[-2]
        pred = resize_bilinear(pred, gt.shape[-3:-1], align_corners=False) * scale
    return smooth_l1_masked(pred, gt, valid_mask(gt))


def multi_scale_loss(
    preds: Sequence[jnp.ndarray], gt: jnp.ndarray, weights: Sequence[float]
) -> jnp.ndarray:
    """Weighted smooth-L1 over a prediction list, mask 0<gt<192
    (multi_disp_loss.py:32-49)."""
    m = valid_mask(gt)
    return sum(
        w * smooth_l1_masked(p, gt, m) for p, w in zip(preds, weights)
    )


def multi_equal_loss(
    preds: Sequence[jnp.ndarray], gt: jnp.ndarray,
    weights: Sequence[float] = (0.8, 1.2),
) -> jnp.ndarray:
    """Weighted smooth-L1 with mask 0<=gt<192
    (multi_equal_loss.py:16-55)."""
    m = valid_mask(gt, lo_inclusive=True)
    return sum(
        w * smooth_l1_masked(p, gt, m) for p, w in zip(preds, weights)
    )


def searching_range_loss(
    pred_disp: jnp.ndarray,
    gt_disp: jnp.ndarray,
    lower_map: jnp.ndarray,
    upper_map: jnp.ndarray,
    alpha: float = 0.9,
) -> jnp.ndarray:
    """Penalise GT falling outside [pred−lower, pred+upper] plus an
    α-blended range-width term (combination_loss.py:56-101).  All inputs
    at the same (1/8) scale; ``gt_disp`` already downscaled."""
    lower_t = pred_disp - lower_map
    upper_t = pred_disp + upper_map
    low_bad = (lower_t - gt_disp > 0).astype(gt_disp.dtype)
    up_bad = (gt_disp - upper_t > 0).astype(gt_disp.dtype)
    loss_lower = jnp.sum(jnp.abs((lower_t - gt_disp) * low_bad)) / (
        jnp.sum(low_bad) + 1e-8
    )
    loss_upper = jnp.sum(jnp.abs((upper_t - gt_disp) * up_bad)) / (
        jnp.sum(up_bad) + 1e-8
    )
    width = jnp.mean(jnp.abs(upper_t - lower_t))
    return alpha * (loss_lower + loss_upper) + (1.0 - alpha) * width


def total_loss(
    pred_disp: jnp.ndarray,
    gt_disp: jnp.ndarray,
    lower_map: Optional[jnp.ndarray] = None,
    upper_map: Optional[jnp.ndarray] = None,
    disp_low: Optional[jnp.ndarray] = None,
    alpha: float = 0.9,
    disp_emphasis: float = 3.0,
    disp_only: bool = False,
) -> jnp.ndarray:
    """disp_emphasis·smooth-L1 + searching-range loss
    (combination_loss.py:104-124)."""
    d = single_scale_loss(pred_disp, gt_disp)
    if disp_only:
        return d
    gt8 = resize_bilinear(gt_disp, disp_low.shape[1:3], align_corners=False) / 8.0
    r = searching_range_loss(disp_low, gt8, lower_map, upper_map, alpha=alpha)
    return d * disp_emphasis + r


def range_and_disparity_loss(
    preds: Sequence[jnp.ndarray],
    gt: jnp.ndarray,
    disp_low: jnp.ndarray,
    lower_bound: jnp.ndarray,
    upper_bound: jnp.ndarray,
    gamma: float = 0.9,
    weights: Sequence[float] = (0.8, 1.2),
) -> jnp.ndarray:
    """Supervised range loss at 1/8 scale ×4 + equal loss
    (multi_equal_with_supervised.py:27-63).

    Reproduces the reference's valid-mask construction including its
    ``upper_bound >= W−1`` test (W is the 1/8 image *width* there, not the
    disparity-bin count — a reference quirk kept for parity,
    multi_equal_with_supervised.py:36).
    """
    B, H8, W8, _ = disp_low.shape
    dmin = disp_low - lower_bound
    dmax = disp_low + upper_bound
    x = jnp.arange(W8, dtype=gt.dtype)[None, None, :, None]
    invalid = (
        (lower_bound < 0).astype(gt.dtype)
        + (upper_bound >= W8 - 1).astype(gt.dtype)
        + (upper_bound > x).astype(gt.dtype)
    )
    valid = 1.0 - jnp.clip(invalid, max=1.0)
    gt8 = resize_bilinear(gt, (H8, W8), align_corners=False) / 8.0

    low_out = ((dmin - gt8) > 0).astype(gt.dtype) * valid
    low_in = valid - low_out
    up_out = ((gt8 - dmax) > 0).astype(gt.dtype) * valid
    up_in = valid - up_out
    denom = jnp.sum(valid) + 1e-8
    lower_range = jnp.sum(
        jnp.abs(gt8 - dmin) * (low_out * gamma + low_in * (1 - gamma))
    ) / denom
    upper_range = jnp.sum(
        jnp.abs(gt8 - dmax) * (up_out * gamma + up_in * (1 - gamma))
    ) / denom
    return (lower_range + upper_range) * 4.0 + multi_equal_loss(preds, gt, weights)
