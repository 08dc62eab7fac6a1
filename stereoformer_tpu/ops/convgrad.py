"""Layout-preserving convolution gradients (the train-step backward lever).

Why this exists: the flagship train step's backward plateaus at ~26-28%
of peak while its conv *fusions* run at 90-95% — the gap is layout work.
JAX autodiff of an NHWC ``conv_general_dilated`` emits the weight
gradient as a convolution with batch as the contraction
(``("CHWN","IHWO","HWNC")``-shaped), and XLA's TPU conv emitter
physically re-lays both operands out to put the contraction dim minor:
device traces attribute ~4.3 ms of transpose/reshape "data formatting" +
~3.2 ms of layout-mismatch copies to these dw convs in a 29 ms
value_and_grad (BENCHMARKS.md "Train-step phase decomposition").

MEASURED OUTCOME (the honest headline): neither reformulation below
beats XLA autodiff *in-model* — tap vag 30.2→39.7 ms, Pallas dw
30.2→39.3 ms (BENCHMARKS.md "dw gradient formulation").  The trace's
transpose/copy self-time is overlapped with adjacent compute better
than the categories suggest, and custom-call/slice boundaries cost
more than they save at these tensor sizes.  Both forms are kept as
opt-in, parity-tested references; the default routes to autodiff
(nn/conv.py:_auto_dw).

The tap idea is algebraic, not a kernel: for a k×k conv the weight gradient is

    dw[di,dj,c,co] = sum_{b,h,w} xp[b, h·s+di, w·s+dj, c] · g[b,h,w,co]

i.e. per kernel tap one ``dot_general`` contracting (B, H, W) — and a
(B,H,W)-contraction of NHWC operands keeps C/Co in lanes and the
contraction in sublanes, exactly the ``xᵀ·dy`` matmul shape the MXU
computes natively with NO re-layout.  The tap slices are plain
(optionally strided) slices of the padded input in its native layout.

The input gradient stays on XLA autodiff (its transposed conv is emitted
in NHWC and was never the problem — the trace shows dx fusions at
90-95% of peak).

Covers what the reference's models actually use (stride 1/2, dilation 1,
explicit or SAME padding, no feature groups); the torch side of this is
simply ``loss.backward()`` through ``nn.Conv2d`` in
``train_file/trainer_DLC_GRU.py:212-213``.

Measured verdicts live in BENCHMARKS.md ("dw gradient formulation");
routing policy in ``nn/conv.py``.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")

Pads = Tuple[Tuple[int, int], Tuple[int, int]]


def resolve_padding(
    padding: Union[str, int, Sequence],
    x_shape,
    kernel_hw: Tuple[int, int],
    strides: Tuple[int, int],
) -> Pads:
    """Normalise a flax-style ``padding`` to explicit ((t,b),(l,r)) pads."""
    if isinstance(padding, str):
        pads = jax.lax.padtype_to_pads(
            x_shape[1:3], kernel_hw, strides, padding.upper()
        )
        return (tuple(pads[0]), tuple(pads[1]))
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else (int(p[0]), int(p[1])))
    assert len(out) == 2, padding
    return (out[0], out[1])


def _conv(x, w, strides: Tuple[int, int], padding: Pads):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=_DN
    )


def conv2d_dw_tap(x, g, kernel_hw, strides: Tuple[int, int], padding: Pads):
    """Weight gradient of an NHWC conv as per-tap (B,H,W) contractions.

    x [B,H,W,C] (conv input), g [B,Ho,Wo,Co] (output cotangent) →
    dw [kh,kw,C,Co], accumulated f32, returned in ``g.dtype``'s precision
    class only after the f32 accumulation (cast by the caller if needed).
    """
    kh, kw = kernel_hw
    sh, sw = strides
    B, H, W, C = x.shape
    _, Ho, Wo, Co = g.shape
    (pt, pb), (pl_, pr) = padding
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0))) \
        if (pt or pb or pl_ or pr) else x
    taps = []
    for di in range(kh):
        for dj in range(kw):
            xs = jax.lax.slice(
                xp,
                (0, di, dj, 0),
                (B, di + (Ho - 1) * sh + 1, dj + (Wo - 1) * sw + 1, C),
                (1, sh, sw, 1),
            )
            taps.append(
                jax.lax.dot_general(
                    xs, g,
                    dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    return jnp.stack(taps, axis=0).reshape(kh, kw, C, Co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_tapgrad(x, w, strides: Tuple[int, int], padding: Pads):
    """NHWC/HWIO conv whose custom VJP computes dw via ``conv2d_dw_tap``
    (layout-preserving batch-contracting matmuls) and dx via the standard
    XLA transposed conv.  Values are bit-identical to
    ``lax.conv_general_dilated``; the dw gradient is the same contraction
    with f32 accumulation (parity-tested).

    Measured verdict (train_phase_bench A/B, v5e bf16 B=4): NET LOSS
    in-model — value_and_grad 30.2 → 39.7 ms; the kh·kw materialised
    slices of x out-cost the removed transposes.  Kept as a tested
    reference; the winning form is the Pallas dw kernel
    (``conv2d_pallas_dwgrad``)."""
    return _conv(x, w, strides, padding)


def _fwd(x, w, strides, padding):
    return _conv(x, w, strides, padding), (x, w)


def _bwd(strides, padding, res, g):
    x, w = res
    # dx: XLA's own transposed conv (NHWC-emitted, not the bottleneck)
    _, vjp = jax.vjp(lambda xx: _conv(xx, w, strides, padding), x)
    (dx,) = vjp(g)
    dw = conv2d_dw_tap(x, g, w.shape[:2], strides, padding).astype(w.dtype)
    return dx, dw


conv2d_tapgrad.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_pallas_dwgrad(x, w, strides: Tuple[int, int], padding: Pads,
                         interpret: bool = False):
    """NHWC/HWIO conv whose custom VJP computes dw with the fused Pallas
    kernel (``ops/pallas/dw_conv.py``: one HBM read of x and g, all taps
    accumulated in VMEM) and dx via the standard XLA transposed conv.

    Stride-1, symmetric-SAME padding only (the flagship's dw-heavy conv
    class); values bit-identical to ``lax.conv_general_dilated``."""
    return _conv(x, w, strides, padding)


def _pfwd(x, w, strides, padding, interpret):
    return _conv(x, w, strides, padding), (x, w)


def _pbwd(strides, padding, interpret, res, g):
    from .pallas.dw_conv import conv2d_dw_pallas

    x, w = res
    _, vjp = jax.vjp(lambda xx: _conv(xx, w, strides, padding), x)
    (dx,) = vjp(g)
    dw = conv2d_dw_pallas(x, g, w.shape[:2], interpret=interpret)
    return dx, dw.astype(w.dtype)


conv2d_pallas_dwgrad.defvjp(_pfwd, _pbwd)


def conv2d(x, w, strides: Tuple[int, int], padding: Pads, dw: str = "xla"):
    """Routing entry: ``dw="pallas"`` → fused Pallas dw kernel;
    ``dw="tap"`` → custom-VJP tap contraction (measured-negative
    reference); ``dw="xla"`` → plain autodiff conv."""
    if dw == "pallas":
        kh, kw = w.shape[:2]
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        assert strides == (1, 1) and padding == ((ph, ph), (pw, pw)), (
            strides, padding)
        return conv2d_pallas_dwgrad(x, w, strides, padding)
    if dw == "tap":
        return conv2d_tapgrad(x, w, strides, padding)
    return _conv(x, w, strides, padding)
