"""Pallas TPU kernel: fused local cost-volume refinement.

Fuses the refinement inner loop — resample [B,H,W,D] at S continuous
candidates (hat-weight formulation), softmax over S, expectation — into a
single VMEM-resident kernel: one read of the volume + candidates, one
write of the refined disparity, instead of materialising the [B,H,W,S]
local volume and score map in HBM (reference pipeline
Attempts/update.py:307-310; XLA path ``ops.local_soft_argmin``).

Grid: one program per (batch, row-block).  Rows are processed W·S and
W·D resident in VMEM; D and S are small (24 / 21) so a row block of 128
pixels uses ≈ 128·(24+21+21)·4B ≈ 34 KB.

Gradient: ``fused_local_soft_argmin`` wraps the kernel in a custom VJP
whose backward is ALSO one fused Pallas kernel (``_bwd_kernel``): it
rematerialises the hat weights / softmax in VMEM and emits dvolume and
dcandidates in a single pass — the XLA autodiff of this chain is the
"loop fusion" elementwise tail that is ~23% of the flagship train-step
backward (BENCHMARKS.md trace attribution; reference region
Attempts/update.py:264-316).  Subgradient choices exactly reproduce the
XLA reference's autodiff (parity-tested):
  - ``jnp.clip`` boundary ties → 0.5 (min∘max tie splitting),
  - ``max(Δ,−Δ)`` at Δ=0 → 0 (ties cancel),
  - ``relu'(0)`` = 0 (hat edge |Δ|=1 contributes nothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(vol_ref, cand_ref, out_ref):
    """vol [R, D], cand [R, S] -> out [R, 1] for a block of R pixels."""
    vol = vol_ref[:]                                   # [R, D]
    cand = cand_ref[:]                                 # [R, S]
    D = vol.shape[-1]
    c = jnp.clip(cand, 0.0, D - 1.0)
    # Mosaic iota must be integer-typed; cast after
    d = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2).astype(jnp.float32)
    delta = c[:, :, None] - d                          # [R, S, D]
    w = jnp.maximum(1.0 - jnp.maximum(delta, -delta), 0.0)
    local = jax.lax.dot_general(
        w, vol,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [R, S]
    score = jax.nn.softmax(local, axis=-1)
    out_ref[:] = jnp.sum(score * cand, axis=-1, keepdims=True)


def _forward(volume: jnp.ndarray, candidates: jnp.ndarray,
             block_rows: int = 256, interpret: bool = False) -> jnp.ndarray:
    B, H, W, D = volume.shape
    S = candidates.shape[-1]
    R = B * H * W
    vol2 = volume.reshape(R, D)
    cand2 = candidates.reshape(R, S)
    # pad rows to a block multiple
    Rp = pl.cdiv(R, block_rows) * block_rows
    if Rp != R:
        vol2 = jnp.pad(vol2, ((0, Rp - R), (0, 0)))
        cand2 = jnp.pad(cand2, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        grid=(Rp // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vol2, cand2)
    return out[:R].reshape(B, H, W, 1)


def _bwd_kernel(vol_ref, cand_ref, g_ref, dvol_ref, dcand_ref):
    """Fused VJP: rematerialise hat weights + softmax, emit both grads.

    vol [R, D], cand [R, S], g [R, 1] -> dvol [R, D], dcand [R, S].
    """
    vol = vol_ref[:]                                   # [R, D]
    cand = cand_ref[:]                                 # [R, S]
    g = g_ref[:]                                       # [R, 1]
    D = vol.shape[-1]
    c = jnp.clip(cand, 0.0, D - 1.0)
    d = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2).astype(jnp.float32)
    delta = c[:, :, None] - d                          # [R, S, D]
    m = jnp.maximum(delta, -delta)
    w = jnp.maximum(1.0 - m, 0.0)
    local = jax.lax.dot_general(
        w, vol,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [R, S]
    score = jax.nn.softmax(local, axis=-1)
    out = jnp.sum(score * cand, axis=-1, keepdims=True)  # [R, 1]

    # d out / d local: softmax VJP of (g · cand)
    dlocal = g * score * (cand - out)                   # [R, S]
    # d out / d volume: contraction of dlocal with the hat weights.
    # lhs gets a singleton non-contracting dim — Mosaic's dot lowering
    # rejects an empty lhs_non_contracting_dims list
    dvol_ref[:] = jax.lax.dot_general(
        dlocal[:, None, :], w,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                          # [R, D]
    # d out / d candidates: direct expectation term + the hat-weight path
    dw = dlocal[:, :, None] * vol[:, None, :]           # [R, S, D]
    # relu'(1−m): 1 where m<1, 0 at m>=1 (incl. the |Δ|=1 hat edge)
    # max(Δ,−Δ)': sign(Δ) with the Δ=0 tie cancelling to 0
    ddelta = -dw * (m < 1.0) * jnp.sign(delta)
    dc = jnp.sum(ddelta, axis=-1)                       # [R, S]
    # clip': 1 inside (0, D−1), 0.5 AT a boundary (min∘max tie split)
    cg = jnp.where(cand > 0.0, 1.0, jnp.where(cand < 0.0, 0.0, 0.5)) * \
        jnp.where(cand < D - 1.0, 1.0, jnp.where(cand > D - 1.0, 0.0, 0.5))
    dcand_ref[:] = g * score + dc * cg


def _backward(volume, candidates, g, block_rows: int = 256,
              interpret: bool = False):
    B, H, W, D = volume.shape
    S = candidates.shape[-1]
    R = B * H * W
    vol2 = volume.reshape(R, D)
    cand2 = candidates.reshape(R, S)
    g2 = g.reshape(R, 1)
    Rp = pl.cdiv(R, block_rows) * block_rows
    if Rp != R:
        vol2 = jnp.pad(vol2, ((0, Rp - R), (0, 0)))
        cand2 = jnp.pad(cand2, ((0, Rp - R), (0, 0)))
        g2 = jnp.pad(g2, ((0, Rp - R), (0, 0)))
    dvol, dcand = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Rp, D), jnp.float32),
            jax.ShapeDtypeStruct((Rp, S), jnp.float32),
        ),
        grid=(Rp // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(vol2, cand2, g2)
    return (dvol[:R].reshape(B, H, W, D), dcand[:R].reshape(B, H, W, S))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_local_soft_argmin(volume, candidates, interpret: bool = False):
    """Drop-in fused replacement for ``ops.local_soft_argmin``
    (volume [B,H,W,D], candidates [B,H,W,S] -> disp [B,H,W,1])."""
    return _forward(volume, candidates, interpret=interpret)


def _fwd(volume, candidates, interpret):
    return _forward(volume, candidates, interpret=interpret), (volume, candidates)


def _bwd(interpret, res, g):
    volume, candidates = res
    return _backward(volume, candidates, g, interpret=interpret)


fused_local_soft_argmin.defvjp(_fwd, _bwd)
