"""Pallas TPU kernel: fused banded correlation volume.

Computes corr[b,h,w,d] = mean_c L[b,h,w,c]·R[b,h,w−d,c] (0 where w<d)
without materialising the W×W similarity matrix in HBM: each program
loads one (b,h) row pair of features into VMEM, runs the W×W matmul on
the MXU, and extracts the D-wide diagonal band in-register.  Saves the
HBM round-trip of the [B,H,W,W] matrix that the XLA path
(``ops.correlation_volume_matmul``) writes (≈ W/D× the band's traffic).

Gradient: custom VJP with the shift-form backward —
  dL[w,c] = Σ_d g[w,d]·R[w−d,c]/C,  dR[v,c] = Σ_d g[v+d,d]·L[v+d,c]/C
— expressed as XLA shifted einsums (no W×W intermediate either).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(l_ref, r_ref, out_ref, *, max_disp: int):
    L = l_ref[0]                                       # [W, C]
    R = r_ref[0]                                       # [W, C]
    W, C = L.shape
    sim = jax.lax.dot_general(
        L, R, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / C                                              # [W, W] (w, v)
    # band[w, d] = sim[w, w−d] as a per-row masked matvec (no scatter —
    # Mosaic has no scatter lowering): selector[w, v, d] = (w − v == d),
    # band = batched (over w) [1,W] @ [W,D] — rides the MXU.
    w3 = jax.lax.broadcasted_iota(jnp.int32, (W, W, max_disp), 0)
    v3 = jax.lax.broadcasted_iota(jnp.int32, (W, W, max_disp), 1)
    d3 = jax.lax.broadcasted_iota(jnp.int32, (W, W, max_disp), 2)
    selector = (w3 - v3 == d3).astype(jnp.float32)     # [W, W, D]
    band = jax.lax.dot_general(
        sim[:, None, :], selector,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                         # [W, D]
    out_ref[0] = band


def _forward(left, right, max_disp: int, interpret: bool = False):
    B, H, W, C = left.shape
    BH = B * H
    l2 = left.reshape(BH, W, C)
    r2 = right.reshape(BH, W, C)
    out = pl.pallas_call(
        functools.partial(_kernel, max_disp=max_disp),
        out_shape=jax.ShapeDtypeStruct((BH, W, max_disp), jnp.float32),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, W, max_disp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(l2, r2)
    return out.reshape(B, H, W, max_disp).astype(left.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def corr_band(left, right, max_disp: int, interpret: bool = False):
    """Fused correlation volume [B,H,W,D] (ops.correlation_volume parity)."""
    return _forward(left, right, max_disp, interpret)


def _fwd(left, right, max_disp, interpret):
    return _forward(left, right, max_disp, interpret), (left, right)


def _shift_right(x, d):
    """y[..., w, :] = x[..., w-d, :] with zero fill."""
    if d == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :-d, :]


def _shift_left(x, d):
    """y[..., v, :] = x[..., v+d, :] with zero fill."""
    if d == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, d), (0, 0)))[:, :, d:, :]


def _bwd(max_disp, interpret, res, g):
    left, right = res
    C = left.shape[-1]
    g = g.astype(jnp.float32) / C
    dl = jnp.zeros_like(left, dtype=jnp.float32)
    dr = jnp.zeros_like(right, dtype=jnp.float32)
    for d in range(max_disp):
        gd = g[..., d : d + 1]                         # [B,H,W,1]
        dl = dl + gd * _shift_right(right.astype(jnp.float32), d)
        dr = dr + _shift_left(gd * left.astype(jnp.float32), d)
    return dl.astype(left.dtype), dr.astype(right.dtype)


corr_band.defvjp(_fwd, _bwd)
