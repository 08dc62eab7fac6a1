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
whose backward re-derives the XLA reference implementation (rematerialise
and differentiate — numerically identical to autodiff of
``local_soft_argmin``, which itself bit-matches the torch reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..local_volume import local_soft_argmin as _xla_local_soft_argmin


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_local_soft_argmin(volume, candidates, interpret: bool = False):
    """Drop-in fused replacement for ``ops.local_soft_argmin``
    (volume [B,H,W,D], candidates [B,H,W,S] -> disp [B,H,W,1])."""
    return _forward(volume, candidates, interpret=interpret)


def _fwd(volume, candidates, interpret):
    return _forward(volume, candidates, interpret=interpret), (volume, candidates)


def _bwd(interpret, res, g):
    volume, candidates = res
    # rematerialise through the (bit-identical) XLA reference for gradients
    _, vjp = jax.vjp(_xla_local_soft_argmin, volume, candidates)
    return vjp(g)


fused_local_soft_argmin.defvjp(_fwd, _bwd)
