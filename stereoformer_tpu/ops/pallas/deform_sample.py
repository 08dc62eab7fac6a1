"""Pallas TPU kernel: fused windowed deformable sampling (DCNv2).

Covers the reference CUDA pipeline ``deform/src/cuda/
modulated_deform_conv_cuda.cu:20-110`` (deformable im2col → GEMM; backward
col2im/col2im_coord ``modulated_deform_im2col_cuda.cuh:197-331``), re-shaped
for the TPU instead of translated:

* **Contraction first.**  Bilinear sampling is linear per pixel, so it
  commutes with the output-channel contraction: with ``G_k = x · W_k`` (a
  1×1 conv per kernel tap — one big MXU matmul), DCNv2 becomes

      out[p, o] = Σ_k  mask_k[p] · bilerp(G_k, p + tap_k + offset_k[p])[o]

  The K·C·Cout GEMM rides the MXU at full tilt *outside* the kernel, and
  the kernel never materialises im2col columns.
* **Window instead of gather.**  Per-element gathers serialise on the TPU
  (Mosaic's ``tpu.dynamic_gather`` spans one vreg), so offsets are clamped
  to a static ±R window and the bilinear sample becomes a hat-weighted
  accumulation over (2R+2)² *static shifted slices* of a VMEM-resident
  band — dense VPU work.  Semantics deviation (documented at
  ``ops.modulated_deform_conv_windowed``): |offset| saturates at R; the
  reference never clamps.  Zero-padding reproduces the outside-samples-
  are-zero rule (``mdcn_im2col_bilinear``).
* **Layout.**  Channels ride the *outer* vector dim ([Co, TH, Wo] blocks,
  rows on sublanes, W on lanes) so the per-pixel hat weights [TH, Wo] are
  computed once per shift in their native layout and broadcast over
  channels for free.  The grid is (batch, row-tile, tap) with the tap
  dimension innermost: the output block stays resident in VMEM while all
  K taps accumulate into it, and each tap's pre-shifted band is streamed
  in by the Pallas pipeline (double-buffered DMA).

Gradient: custom VJP that rematerialises through the (value-identical)
``modulated_deform_conv_windowed`` XLA form — autodiff of the dense hat
formulation reproduces the col2im / col2im_coord structure with no
scatter-adds (same trick as ``ops/pallas/local_refine.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..deform import _window_pads, modulated_deform_conv_windowed


def _kernel(dy_ref, dx_ref, m_ref, band_ref, out_ref, *, S: int):
    """One (batch, row-tile, tap) program.

    dy/dx/m: [1, 1, TH, Wo] clamped offsets + modulation for this tap.
    band:    [1, 1, 1, Co, TH+S-1, Wo+S-1] pre-shifted slice of G_tap.
    out:     [1, Co, TH, Wo], revisited across the (innermost) tap dim.
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    TH, Wo = dy_ref.shape[2], dy_ref.shape[3]
    dy = dy_ref[0, 0]                                   # [TH, Wo]
    dx = dx_ref[0, 0]
    m = m_ref[0, 0]
    R = (S - 2) // 2
    # hat weights per axis shift, modulation folded into the y factor;
    # relu(1-max(Δ,−Δ)) keeps the house integer-offset subgradient
    # convention (ops/local_volume.py:73-79)
    wys = [
        m * jax.nn.relu(1.0 - jnp.maximum(dy - (sy - R), (sy - R) - dy))
        for sy in range(S)
    ]
    wxs = [
        jax.nn.relu(1.0 - jnp.maximum(dx - (sx - R), (sx - R) - dx))
        for sx in range(S)
    ]

    acc = out_ref[0]                                    # [Co, TH, Wo]
    for sy in range(S):
        for sx in range(S):
            w = wys[sy] * wxs[sx]                       # [TH, Wo]
            g = band_ref[0, 0, 0, :, sy : sy + TH, sx : sx + Wo]
            acc = acc + w[None, :, :] * g
    out_ref[0] = acc


def _forward(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    *,
    kernel_size: int,
    padding: int,
    dilation: int,
    window: int,
    block_rows: int,
    interpret: bool,
) -> jnp.ndarray:
    B, H, W, C = x.shape
    k = kernel_size
    K = k * k
    Ho = H + 2 * padding - dilation * (k - 1)
    Wo = W + 2 * padding - dilation * (k - 1)
    R = int(window)
    S = 2 * R + 2                                       # floor..ceil shifts
    Co = weight.shape[-1]

    TH = min(block_rows, Ho)
    nT = pl.cdiv(Ho, TH)
    Ho_p = nT * TH

    # pads sized for the padded row range Ho_p (bands of the last tile
    # read up to row Ho_p-1 + dil*(k-1) + R+1)
    PT, PB, PL, PR = _window_pads(Ho_p, Wo, H, W, k, padding, dilation, R)
    xpad = jnp.pad(x, ((0, 0), (PT, PB), (PL, PR), (0, 0)))
    Hp, Wp = xpad.shape[1], xpad.shape[2]

    # per-tap contraction G_k = xpad · W_k on the MXU, channels-first
    G = jnp.einsum(
        "bhwc,kco->bkohw",
        xpad,
        weight.reshape(K, C, Co).astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)                                   # [B,K,Co,Hp,Wp]

    # pre-shifted bands: band(t, kk) rows start at t·TH + dil·ky (the
    # -padding - R sample extent is absorbed by PT), cols at dil·kx
    THe, Wpe = TH + S - 1, Wo + S - 1
    bands = jnp.stack(
        [
            jnp.stack(
                [
                    jax.lax.slice(
                        G,
                        (0, kk, 0, t * TH + dilation * (kk // k),
                         dilation * (kk % k)),
                        (B, kk + 1, Co, t * TH + dilation * (kk // k) + THe,
                         dilation * (kk % k) + Wpe),
                    )[:, 0]
                    for kk in range(K)
                ],
                axis=1,
            )
            for t in range(nT)
        ],
        axis=1,
    )                                                   # [B,nT,K,Co,THe,Wpe]

    f32 = jnp.float32
    dy = jnp.clip(offsets[..., 0], -R, R).astype(f32)   # [B,Ho,Wo,K]
    dx = jnp.clip(offsets[..., 1], -R, R).astype(f32)
    m = (jnp.ones_like(dy) if mask is None else mask.astype(f32))
    # [B, K, Ho_p, Wo]: rows on sublanes, W on lanes; zero-pad extra rows
    # (m=0 there kills their contribution)
    def _t(a, fill):
        a = jnp.transpose(a, (0, 3, 1, 2))
        return jnp.pad(a, ((0, 0), (0, 0), (0, Ho_p - Ho), (0, 0)),
                       constant_values=fill)

    dy_t, dx_t, m_t = _t(dy, 0.0), _t(dx, 0.0), _t(m, 0.0)

    out = pl.pallas_call(
        functools.partial(_kernel, S=S),
        out_shape=jax.ShapeDtypeStruct((B, Co, Ho_p, Wo), f32),
        grid=(B, nT, K),
        in_specs=[
            pl.BlockSpec((1, 1, TH, Wo), lambda b, t, kk: (b, kk, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, Wo), lambda b, t, kk: (b, kk, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, Wo), lambda b, t, kk: (b, kk, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Co, THe, Wpe),
                         lambda b, t, kk: (b, t, kk, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, TH, Wo), lambda b, t, kk: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dy_t, dx_t, m_t, bands.astype(f32))

    return jnp.transpose(out[:, :, :Ho, :], (0, 2, 3, 1))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def deform_conv_fused(
    x,
    offsets,
    mask,
    weight,
    kernel_size: int = 3,
    padding: int = 1,
    dilation: int = 1,
    window: int = 2,
    block_rows: int = 16,
    interpret: bool = False,
):
    """Fused windowed DCNv2 (stride 1), drop-in for
    ``ops.modulated_deform_conv_windowed(...)`` minus the bias term.

    x [B,H,W,C], offsets [B,Ho,Wo,K,2] (dy,dx), mask [B,Ho,Wo,K] or None,
    weight [K*C, Cout] → [B,Ho,Wo,Cout] float32.
    """
    return _forward(
        x, offsets, mask, weight,
        kernel_size=kernel_size, padding=padding, dilation=dilation,
        window=window, block_rows=block_rows, interpret=interpret,
    )


def _fwd(x, offsets, mask, weight, kernel_size, padding, dilation, window,
         block_rows, interpret):
    out = _forward(
        x, offsets, mask, weight,
        kernel_size=kernel_size, padding=padding, dilation=dilation,
        window=window, block_rows=block_rows, interpret=interpret,
    )
    return out, (x, offsets, mask, weight)


def _bwd(kernel_size, padding, dilation, window, block_rows, interpret,
         res, g):
    x, offsets, mask, weight = res

    def ref(x, offsets, mask, weight):
        return modulated_deform_conv_windowed(
            x, offsets, mask, weight, None,
            kernel_size=kernel_size, stride=1, padding=padding,
            dilation=dilation, window=window,
        ).astype(jnp.float32)

    _, vjp = jax.vjp(ref, x, offsets, mask, weight)
    dx, doff, dmask, dw = vjp(g)
    return dx, doff, (None if mask is None else dmask), dw


deform_conv_fused.defvjp(_fwd, _bwd)
