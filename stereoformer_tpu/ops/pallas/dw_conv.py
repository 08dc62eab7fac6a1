"""Pallas TPU kernel: conv weight-gradient (dw) for stride-1 SAME convs.

Why: JAX autodiff emits the NHWC conv's weight gradient as a
batch-contracting *convolution* (``("CHWN","IHWO","HWNC")`` shape class)
and XLA's TPU conv emitter physically re-lays both operands to put the
contraction minor — device traces attribute ~26% of the flagship
train-step backward to these transposes + layout-mismatch copies
(BENCHMARKS.md "Train-step phase decomposition"; reference hot loop
train_file/trainer_DLC_GRU.py:212-213).  A pure-XLA tap-matmul
reformulation (ops/convgrad.py) removes the transposes but pays kh·kw
materialised slices of x — measured NET LOSS in-model (30.2 → 39.7 ms).

MEASURED VERDICT (v5e, BENCHMARKS.md "dw gradient formulation") — it
depends on the shape class, and the kernel is routed accordingly:
- Flagship 1/8-res sites: NET LOSS in-model (vag 30.2 → 39.3 ms) —
  ~100 custom-call boundaries break XLA's surrounding fusions at
  ~0.1 ms fixed cost each, and the cold remote compile balloons
  66 s → >30 min.  Opt-in only there (``STEREOFORMER_DW_IMPL=pallas``).
- RAFT's full/half-res C≤96 encoder sites (via ``nn.FusedConv`` and the
  size/intensity gate in nn/conv.py:_auto_dw): **WIN** — XLA's CHWN dw
  is HBM-bound at 21-34 TF/s there; this kernel cuts the RAFT backward
  8.2% (full step 337.6 → 325.1 ms at B=4).  Default ON at those sites.
Bit-exact on TPU (rel_err 0 vs autodiff); parity-tested in interpret
mode on CPU.

This kernel reads x and g ONCE each in their native NHWC layout and
accumulates all kh·kw taps in VMEM:

    dw[di,dj,c,co] = sum_{b,h,w} xp[b, h+di, w+dj, c] · g[b,h,w,co]

Structure mirrors ops/pallas/conv2d.py: the grid walks (B, H-tiles); row
halos arrive as one-row side blocks of the same array (index_maps at the
neighbouring rows, zeroed in-kernel at image edges); the kw column taps
are roll+mask lane shifts of the g tile packed into one [C, kw·Co] MXU
contraction per row tap (contraction depth TH·W).  The [kh·kw, C, Co]
f32 accumulator lives in the output block, which every grid step maps to
(constant index_map → stays VMEM-resident, written back once).

Gradient-of-gradient is out of scope (the op IS a gradient); it is only
ever called from custom-VJP backwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, kh: int, kw: int, th: int, h_img: int):
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    x_mid = refs[0]
    prevs = refs[1 : 1 + ph]
    nexts = refs[1 + ph : 1 + 2 * ph]
    g_ref, out_ref = refs[1 + 2 * ph :]

    bi, i = pl.program_id(0), pl.program_id(1)
    nh = pl.num_programs(1)
    hp = nh * th

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = []
    for j in range(ph, 0, -1):
        rows.append(jnp.where(i * th - j < 0, 0.0, prevs[j - 1][0]))
    rows.append(x_mid[0])
    for j in range(1, ph + 1):
        rows.append(jnp.where(i * th + th - 1 + j > hp - 1, 0.0,
                              nexts[j - 1][0]))
    xb = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    # rows beyond the true image height H (the tile-multiple tail) carry
    # pad garbage only in x (g is materialised-padded with zeros by the
    # caller when needed), but zero them anyway for safety
    grow = i * th - ph + jax.lax.broadcasted_iota(jnp.int32, xb.shape, 0)
    xb = jnp.where((grow >= 0) & (grow < h_img), xb, 0.0).astype(xb.dtype)

    gt = g_ref[0]                                        # [TH, W, Co]
    W = gt.shape[1]
    Co = gt.shape[2]
    # pack the kw column taps into lanes: gpack[:, :, dj*Co:(dj+1)*Co]
    # holds g shifted so that column w' aligns with x tap w' (+dj-pw)
    col = jax.lax.broadcasted_iota(jnp.int32, gt.shape, 1)
    # Mosaic's rotate is 32-bit only ("Rotate with non-32-bit data"):
    # roll a f32 view and cast back — bf16→f32→bf16 is bit-exact
    gt32 = gt.astype(jnp.float32)
    packs = []
    for dj in range(kw):
        d = dj - pw
        if d == 0:
            packs.append(gt)
        else:
            # gshift[w'] = gt[w' - d] for w'-d in [0, W), else 0
            packs.append(jnp.where(
                (col - d >= 0) & (col - d < W),
                pltpu.roll(gt32, shift=d % W, axis=1),
                0.0,
            ).astype(gt.dtype))
    gpack = jnp.concatenate(packs, axis=-1) if kw > 1 else packs[0]

    for di in range(kh):
        # Mosaic dots take a single contracting dim: contract W with the
        # rows batched (batch dim untiled), then reduce the row axis
        p = jax.lax.dot_general(
            xb[di : di + th], gpack,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # [TH, C, kw*Co]
        p = jnp.sum(p, axis=0)                           # [C, kw*Co]
        for dj in range(kw):
            out_ref[di * kw + dj] += p[:, dj * Co : (dj + 1) * Co]


def conv2d_dw_pallas(x, g, kernel_hw, tile_h: int = 16,
                     interpret: bool = False):
    """dw of a stride-1 SAME NHWC conv: x [B,H,W,C], g [B,H,W,Co] →
    [kh,kw,C,Co] f32 (one HBM read of each operand, taps in VMEM)."""
    kh, kw = kernel_hw
    assert kh % 2 == 1 and kw % 2 == 1, (kh, kw)
    B, H, W, C = x.shape
    Co = g.shape[-1]
    ph = (kh - 1) // 2
    th = min(tile_h, H)
    nh = -(-H // th)
    if nh * th != H:
        # zero H-tail pad; g's zeros null the x tail's contribution too,
        # but x is padded as well so the in-kernel row mask stays simple
        x = jnp.pad(x, ((0, 0), (0, nh * th - H), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, nh * th - H), (0, 0), (0, 0)))
    hp = nh * th

    mid = pl.BlockSpec((1, th, W, C), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    side = []
    for j in range(1, ph + 1):
        side.append(pl.BlockSpec(
            (1, 1, W, C),
            lambda bi, i, j=j: (bi, jnp.maximum(i * th - j, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    for j in range(1, ph + 1):
        side.append(pl.BlockSpec(
            (1, 1, W, C),
            lambda bi, i, j=j: (
                bi, jnp.minimum(i * th + th - 1 + j, hp - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    g_spec = pl.BlockSpec((1, th, W, Co), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, th=th, h_img=H),
        out_shape=jax.ShapeDtypeStruct((kh * kw, C, Co), jnp.float32),
        grid=(B, nh),
        in_specs=[mid] + side + [g_spec],
        out_specs=pl.BlockSpec((kh * kw, C, Co), lambda bi, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * H * W * kh * kw * C * Co),
            bytes_accessed=int(
                x.size * x.dtype.itemsize + g.size * g.dtype.itemsize
                + kh * kw * C * Co * 4
            ),
            transcendentals=0,
        ) if all(isinstance(d, int) for d in x.shape) else None,
        interpret=interpret,
    )(x, *([x] * (2 * ph)), g)
    return out.reshape(kh, kw, C, Co)
