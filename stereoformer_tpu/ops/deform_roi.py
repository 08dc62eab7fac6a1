"""Deformable position-sensitive RoI pooling (DCNv2's third op family).

Reference: ``deform/src/cuda/deform_psroi_pooling_cuda.cu:59-148``
(forward) / ``:149-…`` (backward-acc) and the wrappers
``deform/modules/deform_psroi_pooling.py:13-130`` — pool a RoI into a
p×p grid of bins; each bin's sample window is shifted by a learned
(Δx, Δy) offset scaled by ``trans_std`` and the RoI size; bin value =
average of ``sample_per_part``² bilinear samples (out-of-image samples
dropped from the count).

TPU design: all RoIs and bins are processed as one batched gather+blend
(static shapes: [N, P, P, S, S] sample points), so the op is a handful of
vectorised gathers + reductions; autodiff supplies the backward (the
CUDA col2im-style accumulation is exactly the transpose).  The models in
the reference never call this op (SURVEY §2.8) — it is provided for full
DCN capability parity.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .deform import bilinear_sample_2d


def deform_psroi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    offsets: Optional[jnp.ndarray],
    pooled_size: int = 7,
    spatial_scale: float = 1.0,
    trans_std: float = 0.1,
    sample_per_part: int = 4,
) -> jnp.ndarray:
    """features [B, H, W, C]; rois [N, 5] as (batch_idx, x1, y1, x2, y2)
    in image coordinates; offsets [N, P, P, 2] (Δx, Δy per bin) or None
    (plain PS-RoI pooling).  Returns [N, P, P, C].
    """
    B, H, W, C = features.shape
    N = rois.shape[0]
    P, S = pooled_size, sample_per_part

    batch_idx = rois[:, 0].astype(jnp.int32)           # [N]
    # RoI corners, scaled and rounded as the CUDA kernel (+0.5 end offset)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / P                                   # [N]
    bin_h = roi_h / P

    if offsets is None:
        offsets = jnp.zeros((N, P, P, 2), features.dtype)
    off_x = offsets[..., 0] * trans_std * roi_w[:, None, None]
    off_y = offsets[..., 1] * trans_std * roi_h[:, None, None]

    ph = jnp.arange(P, dtype=features.dtype)
    pw = jnp.arange(P, dtype=features.dtype)
    iy = (jnp.arange(S, dtype=features.dtype) + 0.5) / S
    ix = (jnp.arange(S, dtype=features.dtype) + 0.5) / S

    # sample coordinates [N, P(h), P(w), S(y), S(x)]
    ys = (
        y1[:, None, None, None, None]
        + (ph[None, :, None, None, None] + iy[None, None, None, :, None])
        * bin_h[:, None, None, None, None]
        + off_y[:, :, :, None, None]
    )
    xs = (
        x1[:, None, None, None, None]
        + (pw[None, None, :, None, None] + ix[None, None, None, None, :])
        * bin_w[:, None, None, None, None]
        + off_x[:, :, :, None, None]
    )
    full = (N, P, P, S, S)
    ys = jnp.broadcast_to(ys, full)
    xs = jnp.broadcast_to(xs, full)
    inside = (
        (ys >= -0.5) & (ys <= H - 0.5) & (xs >= -0.5) & (xs <= W - 0.5)
    ).astype(features.dtype)

    # gather the RoI's source image, then sample all P·P·S·S points at once
    feats_n = features[batch_idx]                       # [N, H, W, C]
    flatP = P * P * S * S
    vals = bilinear_sample_2d(
        feats_n, ys.reshape(N, flatP), xs.reshape(N, flatP)
    ).reshape(N, P, P, S, S, C)
    vals = vals * inside[..., None]
    count = jnp.sum(inside, axis=(3, 4))                # [N, P, P]
    pooled = jnp.sum(vals, axis=(3, 4)) / jnp.maximum(count, 1.0)[..., None]
    return pooled
