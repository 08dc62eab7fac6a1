"""Pallas TPU kernel: fused stride-1 2-D convolution for small channel counts.

Why this exists: XLA's TPU conv emitter lowers the RAFT encoders'
full-resolution stages (stem 7x7 s1 3->64 and layer1's 3x3 64->64 at
576x960, reference models/IterativeLocalCostVolume/extractor/
extractor.py:140-144) with the ``EmitAllBatchInSublanes`` algorithm: it
splits W into 8 overlapping slabs, transposes activations to an H-major
[H, B*8, W/8+halo, C] layout, and surrounds every conv with halo
selects and full-size layout copies — measured ~8.3 ms + ~4.5 ms of
copies per 163-GFLOP conv (~5% MFU) at B=4.

This kernel instead keeps the native NHWC layout and streams
overlapping H-slabs (kh-1 halo rows) from HBM into a double-buffered
VMEM scratch with explicit DMAs — Mosaic cannot express overlapping
windows as pipelined BlockSpecs (Element-indexed specs pin the whole
operand in VMEM), and DMA slices must be tile-aligned on the two minor
dims, so W is padded to a multiple of 8 and C zero-padded to 128
(free: K=64 would idle half the 128-deep MXU and zero weight rows
contribute exactly 0).  Each tap is one MXU dot_general with f32
accumulation; bias, the residual add, and ReLU fuse into the epilogue
and the output is written once in bf16 — no intermediate full-size
tensors ever reach HBM.

Measured (v5e, bf16 B=4 @ 576x960): 3x3 64->64 8.8 ms vs XLA 10.7 ms;
with fused residual+ReLU 10.2 ms vs XLA 19.4 ms (1.9x — XLA
materialises the residual add).  The 7x7 RGB stem loses (C=3->128
padding waste, 25 ms vs 6.5 ms XLA) and stays on XLA.

Backward: custom VJP that differentiates the equivalent XLA conv
(jax.vjp over ``_reference``), so gradients are exactly the XLA conv
gradients the training path already uses.

Semantics (parity-tested against XLA in tests/test_pallas_conv2d.py):
  y = relu?(conv2d(x, w, stride=1, SAME-zero-pad) + b + residual?)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, *rest, kh: int, kw: int, th: int, nh: int,
            relu: bool, has_residual: bool, out_dtype):
    if has_residual:
        res_ref, out_ref, scratch, sems = rest
    else:
        out_ref, scratch, sems = rest
    bi = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    k = bi * nh + i

    # x stays in HBM; each step DMAs its halo'd H-slab into a VMEM
    # scratch slot.  Overlapping slabs cannot be expressed as a
    # pipelined BlockSpec (Element-indexed specs pin the whole operand
    # in VMEM — OOMs past ~H=256 at W=960), so the slab fetch is a
    # manual double-buffered DMA across sequential grid steps.
    def slab_dma(slot, step):
        b2 = step // nh
        i2 = step - b2 * nh
        return pltpu.make_async_copy(
            x_hbm.at[b2, pl.ds(i2 * th, th + kh - 1)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(k == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(k + 1 < nb * nh)
    def _():
        slab_dma((k + 1) % 2, k + 1).start()

    slab_dma(k % 2, k).wait()
    xb = scratch[k % 2]                             # [TH+kh-1, W+kw-1, C]
    Wout = out_ref.shape[2]
    Co = out_ref.shape[3]
    acc = jnp.zeros((th, Wout, Co), jnp.float32)
    # One MXU matmul per kernel COLUMN, with the kh row-taps packed into
    # the N dim (w_ref[dj] is [C, kh*Co]): Co=64 alone fills only half
    # the 128-wide MXU output, so packing row-taps doubles utilisation.
    # Row-tap results then combine as H-shifted adds (dim 0 is untiled —
    # free) with lane-offset slices (vector relayout, cheap vs a matmul).
    for dj in range(kw):
        p = jax.lax.dot_general(
            xb[:, dj : dj + Wout, :], w_ref[dj],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [TH+kh-1, Wout, kh*Co]
        for di in range(kh):
            acc = acc + p[di : di + th, :, di * Co : (di + 1) * Co]
    acc = acc + b_ref[:].astype(jnp.float32)
    if has_residual:
        acc = acc + res_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_dtype)


def _reference(x, w, b, residual, relu):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1),
        [((w.shape[0] - 1) // 2,) * 2, ((w.shape[1] - 1) // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _forward(x, w, b, residual, relu: bool, tile_h: int, interpret: bool):
    B, H, W, C = x.shape
    kh, kw, _, Co = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    th = min(tile_h, H)
    nh = -(-H // th)
    # Mosaic DMA slices must be tile-aligned on the two minor dims
    # ((8, 128) for bf16) while the H dim is untiled and slices freely —
    # so the halo'd H-slab fetch is legal only once W is padded to a
    # multiple of 8 and C to a multiple of 128.  The C zero-pad is free
    # compute: K=64 would leave half the 128-deep MXU idle anyway, and
    # zero weight rows contribute exactly 0 to the f32 accumulator.
    wp_full = -(-(W + kw - 1) // 8) * 8
    cp = -(-C // 128) * 128 if not interpret else C
    # pad W for the halo and H both for the halo and up to a tile multiple
    xp = jnp.pad(x, ((0, 0), (ph, ph + nh * th - H),
                     (pw, wp_full - W - pw), (0, cp - C)))
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - C), (0, 0)))
    # pack the kh row-taps into the N dim: wall[dj] = [C, kh*Co]
    w = jnp.concatenate([w[di] for di in range(kh)], axis=-1)
    args = [xp, w, b]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),       # slab-DMA'd in-kernel
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if residual is not None:
        rp = jnp.pad(residual, ((0, 0), (0, nh * th - H), (0, 0), (0, 0)))
        args.append(rp)
        in_specs.append(
            pl.BlockSpec((1, th, W, Co), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, kh=kh, kw=kw, th=th, nh=nh, relu=relu,
            has_residual=residual is not None, out_dtype=x.dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nh * th, W, Co), x.dtype),
        grid=(B, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, W, Co), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, wp_full, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-vmem stack is marginal once the
            # double-buffered slab scratch + pipelined out/residual
            # windows + the f32 accumulator coexist
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * kh * kw * C * Co,
            bytes_accessed=(x.size + Co * B * H * W) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv2d_fused(x, w, b, residual=None, relu: bool = True,
                 tile_h: int = 8, interpret: bool = False):
    """Fused stride-1 SAME conv + bias (+residual) (+ReLU), NHWC/HWIO.

    Accumulates in f32, writes ``x.dtype`` once; gradients are the XLA
    conv gradients (custom VJP over the reference formulation).
    """
    return _forward(x, w, b, residual, relu, tile_h, interpret)


def _fwd(x, w, b, residual, relu, tile_h, interpret):
    return _forward(x, w, b, residual, relu, tile_h, interpret), (x, w, b, residual)


def _bwd(relu, tile_h, interpret, res, g):
    x, w, b, residual = res

    # Differentiate an explicit-f32 formulation: conv_general_dilated's
    # transpose rule rejects the mixed-dtype cotangents that
    # ``preferred_element_type=f32`` + bf16 operands produce (f32 dy
    # against bf16 w).  The input casts' transposes round dx/dw back to
    # the input dtypes, so callers still see grads in their own dtype.
    def f32_ref(*args):
        cast = [None if a is None else a.astype(jnp.float32) for a in args]
        return _reference(*cast, relu).astype(x.dtype)

    if residual is None:
        _, vjp = jax.vjp(lambda x, w, b: f32_ref(x, w, b, None), x, w, b)
        return (*vjp(g), None)
    _, vjp = jax.vjp(f32_ref, x, w, b, residual)
    return vjp(g)


conv2d_fused.defvjp(_fwd, _bwd)
