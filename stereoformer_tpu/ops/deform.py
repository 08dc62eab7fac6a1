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
needed for correctness.  A Pallas kernel for the fused gather+matmul lives
in ``ops/pallas/deform_sample.py``.

Offset layout here is explicit: ``offsets`` [B, Ho, Wo, K, 2] as (dy, dx)
per kernel tap, ``mask`` [B, Ho, Wo, K] post-sigmoid modulation — the
channel-interleaving of the CUDA kernel (offset channel 2k = Δy_k,
2k+1 = Δx_k, ``modulated_deform_im2col_cuda.cuh:128-194``) is a learned
convolution's output ordering and carries no semantics.
"""

from __future__ import annotations

from typing import Optional

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
