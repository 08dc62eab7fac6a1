"""Pallas TPU kernel: fused stride-1 2-D convolution for small channel counts.

Why this exists: XLA's TPU conv emitter lowers the RAFT encoders'
full-resolution stages (stem 7x7 s1 3->64 and layer1's 3x3 64->64 at
576x960, reference models/IterativeLocalCostVolume/extractor/
extractor.py:140-144) with the ``EmitAllBatchInSublanes`` algorithm: it
splits W into 8 overlapping slabs, transposes activations to an H-major
[H, B*8, W/8+halo, C] layout, and surrounds every conv with halo
selects and full-size layout copies — measured ~8.3 ms + ~4.5 ms of
copies per 163-GFLOP conv (~5% MFU) at B=4.

This kernel keeps the native NHWC layout and tiles H with standard
*pipelined* BlockSpecs.  Overlapping (halo) windows cannot be expressed
directly — Element-indexed specs pin the whole operand in VMEM, and
manual DMA slices must be tile-aligned on the two minor dims, which a
kh-1-row halo never is — so the halo arrives as 2*ph extra one-row
operands of the SAME array whose index_maps point at the neighbouring
rows (a one-row block can address any row).  Out-of-range neighbour
rows are zeroed in-kernel from ``program_id``, reproducing SAME zero
padding without materialising a padded copy of the activation in HBM
(an XLA ``pad`` feeding a custom call cannot fuse — measured 1.7 ms per
conv at [4,578,968,128], as expensive as the conv itself).

Compute: one MXU ``dot_general`` per kernel *column*, with the kh
row-taps packed into the N dim (w[dj] is [C, kh*Co]) — Co=64 alone
fills only half the 128-wide MXU output; row-tap results combine as
free untiled-dim row shifts + lane-slice adds.  C is NOT padded to the
128 lane tile: K=C=64 leaves half the contraction depth idle, but the
N=kh*Co packing already saturates the MXU columns, so padding K buys
nothing and doubles the bytes.  Accumulation is f32; bias, the residual
add, and ReLU fuse into the epilogue; the output is written once in
bf16.

Measured (v5e, bf16 B=4 @ 576x960, in-model): 3x3 64->64 ~2.8 ms vs
XLA ~10.7 ms isolated / ~13 ms with its layout copies.  The 7x7 RGB
stem stays on XLA (3-channel contraction; XLA's
InputFeaturePackedInSublanes emitter is the best known lowering).

Backward: hand-written VJP.  dx is itself a stride-1 SAME conv (rot180
weights, io-transposed) and rides THIS kernel; dw/db are XLA
contractions.  Values match JAX autodiff of the XLA conv (parity
tests), except relu'(0)=0 instead of maximum's 1/2 tie split
(measure-zero, documented at _bwd).

Semantics (parity-tested against XLA in tests/test_pallas_conv2d.py):
  y = relu?(conv2d(x, w, stride=1, SAME-zero-pad) + b + residual?)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, kh: int, kw: int, th: int, nh: int, h_img: int,
            relu: bool, has_residual: bool, has_prologue: bool,
            with_stats: bool, out_dtype):
    ph = (kh - 1) // 2
    mid_ref = refs[0]
    prevs = refs[1 : 1 + ph]
    nexts = refs[1 + ph : 1 + 2 * ph]
    w_ref, b_ref = refs[1 + 2 * ph : 3 + 2 * ph]
    rest = list(refs[3 + 2 * ph :])
    s_ref = t_ref = res_ref = s1_ref = s2_ref = None
    if has_prologue:
        s_ref, t_ref = rest[:2]
        rest = rest[2:]
    if with_stats:
        s1_ref, s2_ref = rest[-2:]
        rest = rest[:-2]
    if has_residual:
        res_ref, out_ref = rest
    else:
        (out_ref,) = rest

    i = pl.program_id(1)
    hp = nh * th
    rows = []
    # neighbour rows, zeroed where the index_map had to clamp at an edge
    # (reproduces SAME zero padding without a materialised HBM pad)
    for j in range(ph, 0, -1):
        rows.append(jnp.where(i * th - j < 0, 0.0, prevs[j - 1][0]))
    rows.append(mid_ref[0])
    for j in range(1, ph + 1):
        rows.append(jnp.where(i * th + th - 1 + j > hp - 1, 0.0,
                              nexts[j - 1][0]))
    xb = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    if has_prologue:
        # fused input transform: relu(x·s + t) per channel — the
        # producer's norm+activation applied as the tile is read, so the
        # normalised activation never exists in HBM.  SAME padding of
        # the conv must stay ZERO (not relu(t)), so out-of-image rows
        # (top/bottom halos and any H-tail pad) are re-zeroed by a
        # global-row validity mask; W edges are already exact (edge
        # columns receive only their valid taps).
        grow = i * th - ph + jax.lax.broadcasted_iota(
            jnp.int32, xb.shape, 0
        )
        bi = pl.program_id(0)
        z = jnp.maximum(xb * s_ref[bi, 0] + t_ref[bi, 0], 0.0)
        xb = jnp.where((grow >= 0) & (grow < h_img), z, 0.0).astype(
            xb.dtype
        )

    Wout = out_ref.shape[2]
    Co = out_ref.shape[3]
    pw = (kw - 1) // 2
    acc = jnp.zeros((th, Wout, Co), jnp.float32)
    # One full-width MXU matmul per kernel COLUMN, with the kh row-taps
    # packed into the N dim (w_ref[dj] is [C, kh*Co]).  The column shift
    # lives in the accumulator update, not the input (an input W-slice
    # is a sublane relayout per tap, and pre-padding W costs a
    # materialised HBM pad): out col w takes in col w+dj-pw, so each tap
    # adds p over a statically-shifted column range and the edge columns
    # receive exactly their valid taps — SAME zero padding for free.
    # Row taps combine as free untiled-dim row shifts + lane slices.
    for dj in range(kw):
        p = jax.lax.dot_general(
            xb, w_ref[dj],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [TH+kh-1, W, kh*Co]
        d = dj - pw
        o0 = max(0, -d)
        n = Wout - abs(d)
        for di in range(kh):
            seg = p[di : di + th, :, di * Co : (di + 1) * Co]
            if d == 0:
                acc = acc + seg
                continue
            # addend[w] = seg[w+d] on the valid range, else 0 — a sublane
            # roll + iota mask (dynamic_update_slice has no TPU lowering)
            col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
            acc = acc + jnp.where(
                (col >= o0) & (col < o0 + n),
                pltpu.roll(seg, shift=(-d) % Wout, axis=1),
                0.0,
            )
    acc = acc + b_ref[:].astype(jnp.float32)
    if has_residual:
        acc = acc + res_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_dtype)
    if with_stats:
        # per-sample channel moments of THIS kernel's output (Σy, Σy²),
        # accumulated across the sequential H-tile grid dim — the norm
        # consumer's stats pass never re-reads y from HBM.  Rows past
        # the true image height (H-tail tile padding) are masked; the
        # f32 accumulator is summed before the out_dtype cast, so the
        # moments see the same values the einsum stats would to within
        # one rounding (the einsum reads the CAST activation; measured
        # ≤1e-3 relative — tests pin it).
        row = i * th + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        accv = jnp.where(row < h_img, acc.astype(out_dtype)
                         .astype(jnp.float32), 0.0)
        # moments via PAIRWISE (fold-halving) summation, not a straight
        # VPU reduce and not MXU dots: the plain reduce's long chain
        # measured var rel-err 6e-4 (the m2 − m1² cancellation amplifies
        # summation error and instance-norm rsqrt amplifies var error);
        # MXU [1,M] dots at HIGHEST precision fixed accuracy (4e-5) but
        # the degenerate shape cost +7 ms/step.  Contiguous half+half
        # folds give an O(log N)-depth tree — measured var rel-err
        # BETTER than the einsum baseline at one elementwise pass's
        # cost.
        def _fold(m):
            while m.shape[0] > 8:
                n2 = m.shape[0] // 2
                top = m[n2 : 2 * n2]
                m = m[:n2] + top if 2 * n2 == m.shape[0] else \
                    jnp.concatenate([m[:n2] + top, m[2 * n2:]], axis=0)
            return jnp.sum(m, axis=0)[None, :]

        flat = accv.reshape(-1, accv.shape[-1])           # [th·W, Co]
        p1 = _fold(flat)                                  # [1, Co]
        p2 = _fold(flat * flat)

        @pl.when(i == 0)
        def _init():
            s1_ref[0] = p1
            s2_ref[0] = p2

        @pl.when(i > 0)
        def _acc():
            s1_ref[0] += p1
            s2_ref[0] += p2


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


def _cost_estimate(x, B, H, W, kh, kw, C, Co):
    try:  # symbolic dims (jax.export shape polymorphism) have no int form
        return pl.CostEstimate(
            flops=int(2 * B * H * W * kh * kw * C * Co),
            bytes_accessed=int((x.size + Co * B * H * W) * x.dtype.itemsize),
            transcendentals=0,
        )
    except TypeError:
        return None


def _forward(x, w, b, residual, relu: bool, tile_h: int, interpret: bool,
             s=None, t=None, with_stats: bool = False):
    B, H, W, C = x.shape
    kh, kw, _, Co = w.shape
    ph = (kh - 1) // 2
    th = min(tile_h, H)
    nh = -(-H // th)
    wp = W
    # Only the H tail (to a tile multiple) is ever padded — typically a
    # no-op.  W and C are NOT padded: the column halo lives in the
    # accumulator update and the row halo in the side blocks, so no
    # materialised HBM pad (measured 1.7 ms per conv at full res, as
    # expensive as the conv itself) survives in the graph.
    xp = jnp.pad(x, ((0, 0), (0, nh * th - H), (0, 0), (0, 0))) \
        if nh * th != H else x
    # pack the kh row-taps into the N dim: wall[dj] = [C, kh*Co]
    w = jnp.concatenate([w[di] for di in range(kh)], axis=-1)

    mid = pl.BlockSpec((1, th, wp, C), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    # the same array is passed again for each halo row; a one-row block's
    # index_map can address any row (clamped at edges, zeroed in-kernel)
    side = []
    hp = nh * th
    for j in range(1, ph + 1):
        side.append(pl.BlockSpec(
            (1, 1, wp, C),
            lambda bi, i, j=j: (bi, jnp.maximum(i * th - j, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    for j in range(1, ph + 1):
        side.append(pl.BlockSpec(
            (1, 1, wp, C),
            lambda bi, i, j=j: (
                bi, jnp.minimum(i * th + th - 1 + j, hp - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    args = [xp] + [xp] * (2 * ph) + [w, b]
    in_specs = [mid] + side + [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if s is not None:
        # [B,1,C]: leading dim untiled, so the kernel can index its batch
        # row dynamically (a (1,C) block of a [B,C] array violates the
        # (8,128)-divisible-or-full block rule)
        args += [s[:, None, :], t[:, None, :]]
        in_specs += [
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
    out_shape = jax.ShapeDtypeStruct((B, nh * th, W, Co), x.dtype)
    out_specs = pl.BlockSpec((1, th, W, Co), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM)
    if with_stats:
        # moment outputs [B,1,Co] f32: one (1,1,Co) block per sample,
        # revisited (accumulated) across the sequential H-tile grid dim
        stat = jax.ShapeDtypeStruct((B, 1, Co), jnp.float32)
        stat_spec = pl.BlockSpec((1, 1, Co), lambda bi, i: (bi, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = [out_shape, stat, stat]
        out_specs = [out_specs, stat_spec, stat_spec]
    out = pl.pallas_call(
        functools.partial(
            _kernel, kh=kh, kw=kw, th=th, nh=nh, h_img=H, relu=relu,
            has_residual=residual is not None,
            has_prologue=s is not None, with_stats=with_stats,
            out_dtype=x.dtype,
        ),
        out_shape=out_shape,
        grid=(B, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-vmem stack is marginal once the
            # pipelined in/out/residual windows + the f32 tap matrix +
            # accumulator coexist
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=_cost_estimate(x, B, H, W, kh, kw, C, Co),
        interpret=interpret,
    )(*args)
    if with_stats:
        y, s1, s2 = out
        y = y[:, :H] if nh * th != H else y
        return y, s1[:, 0], s2[:, 0]
    return out[:, :H] if nh * th != H else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv2d_fused(x, w, b, residual=None, relu: bool = True,
                 tile_h: int = 16, interpret: bool = False):
    """Fused stride-1 SAME conv + bias (+residual) (+ReLU), NHWC/HWIO.

    Accumulates in f32, writes ``x.dtype`` once; the input gradient runs
    on this same kernel (see ``_bwd``), dw/db on XLA contractions.
    """
    return _forward(x, w, b, residual, relu, tile_h, interpret)


def _fwd(x, w, b, residual, relu, tile_h, interpret):
    out = _forward(x, w, b, residual, relu, tile_h, interpret)
    return out, (x, w, b, out if relu else None, residual is not None)


def _dw(x, gpre, kh, kw, ph, pw, interpret, dtype):
    """Weight gradient of the fused conv's sites.

    Default: the Pallas dw kernel (ops/pallas/dw_conv.py) — at THESE
    sites (full/half-res C=64-96, the FusedConv shape class) the XLA
    CHWN dw conv is HBM-bound at 21-34 TF/s (RAFT vag trace, ~14 ms of
    a 194 ms step across fnet/cnet layer1 alone) because it re-reads
    re-laid-out copies of both operands; the kernel reads x and g once
    each.  This is the opposite verdict from the flagship's 1/8-res
    sites (nn/conv.py:_auto_dw), where call overhead dominates — same
    kernel, routed by shape class, both measured.
    ``STEREOFORMER_FUSEDCONV_DW=xla`` restores the CHWN conv (A/B).
    """
    import os

    if (
        os.environ.get("STEREOFORMER_FUSEDCONV_DW", "") != "xla"
        and x.shape[-1] >= 16
        and all(isinstance(d, int) for d in x.shape)
    ):
        from .dw_conv import conv2d_dw_pallas

        return conv2d_dw_pallas(x, gpre, (kh, kw),
                                interpret=interpret).astype(dtype)
    return jax.lax.conv_general_dilated(
        x, gpre, (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _bwd(relu, tile_h, interpret, res, g):
    """Hand-written backward so the input gradient ALSO rides the Pallas
    kernel: for a stride-1 SAME conv, dx is itself a stride-1 SAME conv
    of the cotangent with the spatially-flipped, io-transposed weights —
    the exact full-res C<=128 shape class where XLA's conv emitter is
    slowest (the reason this kernel exists).  dw goes through ``_dw``
    (Pallas dw kernel at these shapes; see its docstring).

    ReLU deviation (documented): the saved-output mask ``out > 0`` gives
    the pre-activation gradient 0 at exactly-zero pre-activations, where
    jnp.maximum's tie-splitting rule would give g/2 — a measure-zero set
    (grad parity tests pass on random data).
    """
    x, w, b, out, has_res = res
    kh, kw, C, _ = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    gpre = jnp.where(out > 0, g, 0).astype(g.dtype) if relu else g
    db = jnp.sum(gpre.astype(jnp.float32), axis=(0, 1, 2)).astype(b.dtype)
    # dx: SAME conv of gpre with rot180(w), in/out channels swapped
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv2d_fused(
        gpre, w_rot, jnp.zeros((C,), gpre.dtype), None, False, tile_h,
        interpret,
    ).astype(x.dtype)
    dw = _dw(x, gpre, kh, kw, ph, pw, interpret, w.dtype)
    dres = gpre if has_res else None
    return dx, dw, db, dres


conv2d_fused.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv2d_fused_prologue(x, w, b, s, t, relu: bool = False,
                          tile_h: int = 16, interpret: bool = False):
    """Conv with a fused producer epilogue as the input PROLOGUE:

        y = relu?(conv2d(relu(x·s + t), w, SAME) + b)

    ``s``/``t`` are per-sample per-channel [B, C] (a norm's affine form:
    s = inv·scale, t = bias − mean·inv·scale), applied in-kernel as each
    tile is read — the normalised activation never exists in HBM, which
    deletes the producer norm+ReLU's full-size write and this conv's
    re-read (~0.7 ms per full-res seam at [4,576,960,64]).

    Backward is hand-written and keeps the conv input-gradient on the
    Pallas kernel; the prologue transform gradients (dx, ds, dt) are
    elementwise + [B,C] reductions.  relu'(0)=0 tie deviation as in
    ``conv2d_fused``.
    """
    return _forward(x, w, b, None, relu, tile_h, interpret, s=s, t=t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv2d_fused_stats(x, w, b, relu: bool = False,
                       tile_h: int = 16, interpret: bool = False):
    """``conv2d_fused`` that ALSO emits its output's per-sample channel
    moments ``(y, Σy, Σy²)`` — accumulated in-kernel across the H-tile
    grid, so a consumer norm's stats pass (a full HBM re-read of y,
    measured 0.75 ms per full-res instance-norm site in RAFT eval) is
    deleted.  Differentiable: the moments' cotangents fold into the
    output cotangent elementwise (``g = ȳ + s̄1 + 2y·s̄2``) before the
    standard hand-written backward (grad-parity-tested)."""
    return _forward(x, w, b, None, relu, tile_h, interpret,
                    with_stats=True)


def _stats_total_cotangent(y, cot):
    gy, gs1, gs2 = cot
    g = (gy.astype(jnp.float32)
         + gs1.astype(jnp.float32)[:, None, None, :]
         + 2.0 * y.astype(jnp.float32)
         * gs2.astype(jnp.float32)[:, None, None, :])
    return g.astype(gy.dtype)


def _stats_fwd(x, w, b, relu, tile_h, interpret):
    out = conv2d_fused_stats(x, w, b, relu, tile_h, interpret)
    return out, (x, w, b, out[0])


def _stats_bwd(relu, tile_h, interpret, res, cot):
    x, w, b, y = res
    g = _stats_total_cotangent(y, cot)
    # same backward as conv2d_fused (no residual); the relu mask applies
    # to the TOTAL cotangent (at y == 0, dΣy/dpre and dΣy²/dpre are 0
    # through the same mask)
    dx, dw, db, _ = _bwd(relu, tile_h, interpret,
                         (x, w, b, y if relu else None, False), g)
    return dx, dw, db


conv2d_fused_stats.defvjp(_stats_fwd, _stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv2d_fused_prologue_stats(x, w, b, s, t, relu: bool = False,
                                tile_h: int = 16, interpret: bool = False):
    """``conv2d_fused_prologue`` + output moments (see
    ``conv2d_fused_stats``); differentiable the same way."""
    return _forward(x, w, b, None, relu, tile_h, interpret, s=s, t=t,
                    with_stats=True)


def _pstats_fwd(x, w, b, s, t, relu, tile_h, interpret):
    out = conv2d_fused_prologue_stats(x, w, b, s, t, relu, tile_h,
                                      interpret)
    return out, (x, w, b, s, t, out[0])


def _pstats_bwd(relu, tile_h, interpret, res, cot):
    x, w, b, s, t, y = res
    g = _stats_total_cotangent(y, cot)
    return _prologue_bwd(relu, tile_h, interpret,
                         (x, w, b, s, t, y if relu else None), g)


conv2d_fused_prologue_stats.defvjp(_pstats_fwd, _pstats_bwd)


def _prologue_ref(x, w, b, s, t, relu):
    z = jnp.maximum(
        x.astype(jnp.float32) * s[:, None, None, :] + t[:, None, None, :],
        0.0,
    ).astype(x.dtype)
    return _reference(z, w, b, None, relu)


def _prologue_fwd(x, w, b, s, t, relu, tile_h, interpret):
    out = conv2d_fused_prologue(x, w, b, s, t, relu, tile_h, interpret)
    return out, (x, w, b, s, t, out if relu else None)


def _prologue_bwd(relu, tile_h, interpret, res, g):
    x, w, b, s, t, out = res
    kh, kw, C, _ = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    gpre = jnp.where(out > 0, g, 0).astype(g.dtype) if relu else g
    db = jnp.sum(gpre.astype(jnp.float32), axis=(0, 1, 2)).astype(b.dtype)
    # recompute the transformed input (elementwise; XLA fuses it into
    # the surrounding gradient math)
    u = x.astype(jnp.float32) * s[:, None, None, :] + t[:, None, None, :]
    z = jnp.maximum(u, 0.0).astype(x.dtype)
    dw = _dw(z, gpre, kh, kw, ph, pw, interpret, w.dtype)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dz = conv2d_fused(
        gpre, w_rot, jnp.zeros((C,), gpre.dtype), None, False, tile_h,
        interpret,
    ).astype(jnp.float32)
    du = jnp.where(u > 0, dz, 0.0)
    dx = (du * s[:, None, None, :]).astype(x.dtype)
    ds = jnp.einsum(
        "bhwc,bhwc->bc", du, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(s.dtype)
    dt = jnp.sum(du, axis=(1, 2)).astype(t.dtype)
    return dx, dw, db, ds, dt


conv2d_fused_prologue.defvjp(_prologue_fwd, _prologue_bwd)


def _kernel_s2(xee_ref, xeo_ref, xoe_ref, xoep_ref, xoo_ref, xoop_ref,
               wee_ref, weo_ref, woe_ref, woo_ref, b_ref, out_ref, *,
               th2: int, nh: int, h_img: int, relu: bool, out_dtype):
    """Stride-2 3x3 variant on a 4-phase space-to-depth input (rows AND
    columns split OUTSIDE the kernel — Mosaic supports neither strided
    slicing nor sublane-splitting reshapes in-VMEM, and a strided
    untiled-dim row select lowers to an unsupported gather).  Out pixel
    (r, w) reads row phases E=2r / O=2r±1 and col phases e=2w / o=2w±1,
    so every in-kernel access is a contiguous slice: row taps become
    contiguous untiled-dim slices of the odd-row slab (mid + one prev
    halo row), the dj=0 tap a roll+mask, and the 9 taps pack into 4
    phase matmuls (N = Co/2Co/2Co/4Co)."""
    i = pl.program_id(1)

    def emask(x, s0):
        # even-row slab: slab row s = global input row 2*(i*th2 + s + s0)
        grow = 2 * (i * th2 + s0 + jax.lax.broadcasted_iota(
            jnp.int32, x.shape, 0))
        return jnp.where(grow < h_img, x, 0.0).astype(x.dtype)

    def oslab(mid_ref, prev_ref):
        # odd-row slab rows -1..th2-1: global odd row 2*(i*th2+s-1)+1
        top = jnp.where(2 * i * th2 - 1 >= 0, prev_ref[0], 0.0)
        xb = jnp.concatenate([top, mid_ref[0]], axis=0)  # [th2+1, W2, C]
        grow = 2 * (i * th2 - 1 + jax.lax.broadcasted_iota(
            jnp.int32, xb.shape, 0)) + 1
        return jnp.where(grow < h_img, xb, 0.0).astype(xb.dtype)

    xee = emask(xee_ref[0], 0)
    xeo = emask(xeo_ref[0], 0)
    xoe = oslab(xoe_ref, xoep_ref)
    xoo = oslab(xoo_ref, xoop_ref)
    W2 = out_ref.shape[2]
    Co = out_ref.shape[3]
    dn = (((2,), (0,)), ((), ()))
    f32 = jnp.float32
    pee = jax.lax.dot_general(xee, wee_ref[:], dn, preferred_element_type=f32)
    peo = jax.lax.dot_general(xeo, weo_ref[:], dn, preferred_element_type=f32)
    poe = jax.lax.dot_general(xoe, woe_ref[:], dn, preferred_element_type=f32)
    poo = jax.lax.dot_general(xoo, woo_ref[:], dn, preferred_element_type=f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (th2, W2, Co), 1)

    def lshift(p):  # out col w <- src col w-1 (col 0: zero pad)
        return jnp.where(col >= 1, pltpu.roll(p, shift=1, axis=1), 0.0)

    acc = pee                                        # (di=1, dj=1)
    acc = acc + lshift(peo[:, :, :Co])               # (1, 0)
    acc = acc + peo[:, :, Co:]                       # (1, 2)
    acc = acc + poe[0:th2, :, :Co]                   # (0, 1)
    acc = acc + poe[1 : th2 + 1, :, Co:]             # (2, 1)
    acc = acc + lshift(poo[0:th2, :, :Co])           # (0, 0)
    acc = acc + poo[0:th2, :, Co : 2 * Co]           # (0, 2)
    acc = acc + lshift(poo[1 : th2 + 1, :, 2 * Co : 3 * Co])  # (2, 0)
    acc = acc + poo[1 : th2 + 1, :, 3 * Co :]        # (2, 2)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_dtype)


def _forward_s2(x, w, b, relu: bool, tile_h: int, interpret: bool):
    B, H, W, C = x.shape
    kh, kw, _, Co = w.shape
    assert (kh, kw) == (3, 3) and H % 2 == 0 and W % 2 == 0, (kh, kw, H, W)
    H2, W2 = H // 2, W // 2
    th2 = min(tile_h, H2)
    nh = -(-H2 // th2)
    xp = jnp.pad(x, ((0, 0), (0, 2 * nh * th2 - H), (0, 0), (0, 0))) \
        if nh * th2 != H2 else x
    # 4-phase space-to-depth (one XLA read+write of x)
    xee = xp[:, 0::2, 0::2, :]
    xeo = xp[:, 0::2, 1::2, :]
    xoe = xp[:, 1::2, 0::2, :]
    xoo = xp[:, 1::2, 1::2, :]
    # per-phase packed weights (lane segments in kernel tap order)
    wee = w[1, 1]
    weo = jnp.concatenate([w[1, 0], w[1, 2]], axis=-1)
    woe = jnp.concatenate([w[0, 1], w[2, 1]], axis=-1)
    woo = jnp.concatenate([w[0, 0], w[0, 2], w[2, 0], w[2, 2]], axis=-1)
    mid = pl.BlockSpec((1, th2, W2, C), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (1, 1, W2, C),
        lambda bi, i: (bi, jnp.maximum(i * th2 - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel_s2, th2=th2, nh=nh, h_img=H, relu=relu,
            out_dtype=x.dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nh * th2, W2, Co), x.dtype),
        grid=(B, nh),
        in_specs=[mid, mid, mid, prev, mid, prev,
                  full, full, full, full, full],
        out_specs=pl.BlockSpec((1, th2, W2, Co), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=_cost_estimate(x, B, H2, W2, kh, kw, C, Co),
        interpret=interpret,
    )(xee, xeo, xoe, xoe, xoo, xoo, wee, weo, woe, woo, b)
    return out[:, :H2] if nh * th2 != H2 else out


def _reference_s2(x, w, b, relu):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv2d_fused_s2(x, w, b, relu: bool = False, tile_h: int = 16,
                    interpret: bool = False):
    """Fused stride-2 3x3 SAME conv + bias (+ReLU), NHWC/HWIO.

    Measured verdict (v5e, bf16 [4,576,960,64->96]): LOSES to XLA
    (12.9 vs 6.9 ms) — the 4-phase space-to-depth the kernel needs
    (Mosaic cannot stride-slice or sublane-split in VMEM, and strided
    untiled-dim selects lower to unsupported gathers) costs four
    strided-slice relayout copies of the full-res input, which exceeds
    the conv win.  Kept as a parity-tested reference (same status as
    ops/pallas/deform_sample.py); stride-2 sites stay on XLA.  The
    backward is the XLA transposed conv (a stride-2 dx is a scatter,
    not this kernel's shape class)."""
    return _forward_s2(x, w, b, relu, tile_h, interpret)


def _s2_fwd(x, w, b, relu, tile_h, interpret):
    return _forward_s2(x, w, b, relu, tile_h, interpret), (x, w, b)


def _s2_bwd(relu, tile_h, interpret, res, g):
    x, w, b = res

    def f32_ref(x, w, b):
        cast = [a.astype(jnp.float32) for a in (x, w, b)]
        return _reference_s2(*cast, relu).astype(x.dtype)

    _, vjp = jax.vjp(f32_ref, x, w, b)
    return vjp(g)


conv2d_fused_s2.defvjp(_s2_fwd, _s2_bwd)
