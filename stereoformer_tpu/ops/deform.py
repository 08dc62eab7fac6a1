"""Modulated deformable convolution (DCNv2 capability), TPU-native.

The reference vendors a CUDA extension (``deform/src/cuda/
modulated_deform_conv_cuda.cu:20-279`` — deformable im2col, then GEMM, with
hand-written col2im/col2im_coord backwards).  On TPU the same computation
is expressed as: per-tap bilinear gathers with zero padding (offsets and
modulation masks are per-pixel, per-tap) building columns
[B, Ho, Wo, K·C], followed by a single matmul against the [K·C, Cout]
weight — the gather is bandwidth-bound VPU work, the contraction rides the
MXU, and autodiff reproduces exactly the col2im / col2im_coord gradients
(scatter-add of blend weights and (v_hi − v_lo) terms), so no custom VJP is
needed for correctness.

Per-element gathers serialise on the TPU VPU, so this module also provides
``modulated_deform_conv_windowed``: offsets are clamped to a static ±W
window and the bilinear sample becomes a dense hat-weighted accumulation
over (2W+2)² static image shifts — no gathers forward, no scatter-adds
backward (the same reformulation that makes ``ops.resample_volume`` fast).
Within the window the two forms agree exactly in value and (at non-integer
offsets) gradient.  ``ops/pallas/deform_sample.py`` fuses the windowed
sampling, modulation and tap matmul into one VMEM-resident kernel.

Offset layout here is explicit: ``offsets`` [B, Ho, Wo, K, 2] as (dy, dx)
per kernel tap, ``mask`` [B, Ho, Wo, K] post-sigmoid modulation — the
channel-interleaving of the CUDA kernel (offset channel 2k = Δy_k,
2k+1 = Δx_k, ``modulated_deform_im2col_cuda.cuh:128-194``) is a learned
convolution's output ordering and carries no semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bilinear_sample_2d(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC ``img`` [B,H,W,C] at continuous (y, x) [B,P] with zero
    padding outside the image (DCN ``mdmcn_im2col_bilinear`` semantics,
    modulated_deform_im2col_cuda.cuh:25-55).  Returns [B, P, C]."""
    B, H, W, C = img.shape
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    ty = y - y0.astype(y.dtype)
    tx = x - x0.astype(x.dtype)

    flat = img.reshape(B, H * W, C)

    def tap(yi, xi):
        ok = ((yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1))
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * ok[..., None].astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    ty = ty[..., None]
    tx = tx[..., None]
    return (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )


def deform_columns(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable im2col: sample each kernel tap at its offset location.

    x: [B, H, W, C]; offsets: [B, Ho, Wo, K, 2] (dy, dx);
    mask: [B, Ho, Wo, K] or None (plain deform_conv).
    Returns columns [B, Ho, Wo, K*C].
    """
    B, H, W, C = x.shape
    k = kernel_size
    Ho = (H + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    K = k * k

    ho = jnp.arange(Ho, dtype=x.dtype) * stride - padding
    wo = jnp.arange(Wo, dtype=x.dtype) * stride - padding
    # per-tap (row-major ky, kx) base offsets, [K]
    tap = jnp.arange(K)
    tap_y = (tap // k).astype(x.dtype) * dilation
    tap_x = (tap % k).astype(x.dtype) * dilation
    base_y = ho[:, None, None] + tap_y[None, None, :]   # [Ho, 1, K]
    base_x = wo[None, :, None] + tap_x[None, None, :]   # [1, Wo, K]
    yy = base_y + offsets[..., 0]                      # [B,Ho,Wo,K]
    xx = base_x + offsets[..., 1]

    cols = bilinear_sample_2d(
        x, yy.reshape(B, -1), xx.reshape(B, -1)
    ).reshape(B, Ho, Wo, K, C)
    if mask is not None:
        cols = cols * mask[..., None]
    return cols.reshape(B, Ho, Wo, K * C)


def modulated_deform_conv(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """DCNv2 forward: deformable columns × weight (+ bias).

    weight: [K*C, Cout] (flattened (ky, kx, cin) tap-major).
    Equivalent computation to ``modulated_deform_conv_cuda.cu:20-110``.
    """
    cols = deform_columns(
        x, offsets, mask, kernel_size, stride, padding, dilation
    )
    out = jnp.einsum(
        "bhwk,ko->bhwo", cols, weight, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _window_pads(Ho: int, Wo: int, H: int, W: int, k: int, padding: int,
                 dilation: int, window: int):
    """Zero-pad extents so every windowed sample is an in-bounds static
    slice.  Row index into the padded image is
    ``i + dilation*ky - padding + s + PT`` with ``s ∈ [-window, window+1]``
    (the floor/ceil shifts of a clamped offset); zeros in the pad region
    reproduce the reference's outside-the-image-samples-are-zero rule
    (mdcn_im2col_bilinear, modulated_deform_im2col_cuda.cuh:25-55)."""
    PT = padding + window
    PL = padding + window
    max_row = (Ho - 1) + dilation * (k - 1) - padding + (window + 1) + PT
    max_col = (Wo - 1) + dilation * (k - 1) - padding + (window + 1) + PL
    PB = max(0, max_row - (H + PT - 1))
    PR = max(0, max_col - (W + PL - 1))
    return PT, PB, PL, PR


def modulated_deform_conv_windowed(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    window: int = 2,
) -> jnp.ndarray:
    """DCNv2 forward with offsets clamped to a static ±``window`` px range,
    as dense shifted accumulation (gather-free; see module docstring).

    Deliberate deviation from the CUDA reference: the reference never
    clamps its learned offsets.  Offsets come from a zero-initialised conv
    (ModulatedDeformConvPack.init_offset) and stay small in practice; any
    |offset| > window saturates at the window edge (gradient 0 there, the
    ``jnp.clip`` subgradient).  Use ``modulated_deform_conv`` for exact
    unbounded semantics.
    """
    if stride != 1:
        raise NotImplementedError("windowed form supports stride=1 only")
    B, H, W, C = x.shape
    k = kernel_size
    K = k * k
    Ho = H + 2 * padding - dilation * (k - 1)
    Wo = W + 2 * padding - dilation * (k - 1)
    R = int(window)

    PT, PB, PL, PR = _window_pads(Ho, Wo, H, W, k, padding, dilation, R)
    xpad = jnp.pad(x, ((0, 0), (PT, PB), (PL, PR), (0, 0)))

    dy = jnp.clip(offsets[..., 0], -R, R)              # [B,Ho,Wo,K]
    dx = jnp.clip(offsets[..., 1], -R, R)
    shifts = jnp.arange(-R, R + 2, dtype=x.dtype)      # [S] floor..ceil range
    # hat weights; relu(1-max(Δ,−Δ)) keeps the house subgradient convention
    # at integer offsets (see ops/local_volume.py:73-79)
    wy = jax.nn.relu(1.0 - jnp.maximum(dy[..., None] - shifts,
                                       shifts - dy[..., None]))  # [B,Ho,Wo,K,S]
    wx = jax.nn.relu(1.0 - jnp.maximum(dx[..., None] - shifts,
                                       shifts - dx[..., None]))
    if mask is not None:
        wy = wy * mask[..., None]                      # fold modulation once

    S = shifts.shape[0]
    wk = weight.reshape(K, C, -1)
    out = jnp.zeros((B, Ho, Wo, wk.shape[-1]), jnp.float32)
    for kk in range(K):
        ky, kx = kk // k, kk % k
        r0 = dilation * ky - padding + PT - R
        c0 = dilation * kx - padding + PL - R
        acc = jnp.zeros((B, Ho, Wo, C), x.dtype)
        for sy in range(S):
            # row band shared by every sx of this (kk, sy)
            band = jax.lax.slice(
                xpad, (0, r0 + sy, c0, 0),
                (B, r0 + sy + Ho, c0 + Wo + S - 1, C))
            wys = wy[..., kk, sy]
            for sx in range(S):
                w = wys * wx[..., kk, sx]              # [B,Ho,Wo]
                sl = jax.lax.slice(
                    band, (0, 0, sx, 0), (B, Ho, sx + Wo, C))
                acc = acc + w[..., None].astype(x.dtype) * sl
        out = out + jnp.einsum(
            "bhwc,co->bhwo", acc, wk[kk],
            preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
