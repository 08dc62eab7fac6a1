"""``Conv`` — drop-in ``flax.linen.Conv`` with selectable weight-gradient
formulation.

Same parameter tree as ``nn.Conv`` (``kernel``/``bias`` names, HWIO
shape, lecun-normal default init) and the same auto-naming prefix
(``Conv_0`` …, because the class is also called ``Conv``), so swapping
it into existing modules keeps every checkpoint loadable.  The forward
is the identical ``lax.conv_general_dilated``.

The *backward* is routable: XLA autodiff emits the weight gradient as a
CHWN-re-laid-out conv (the transposes/copies the round-2 trace flagged
at ~26% of the flagship backward); ``ops/convgrad.py`` provides two
reformulations — per-tap (B,H,W)-contracting matmuls ("tap") and a
fused Pallas dw kernel ("pallas", ops/pallas/dw_conv.py).  Measured
verdicts (v5e, BENCHMARKS.md "dw gradient formulation"): both LOSE
in-model at the flagship's small 1/8-res sites (call overhead), but
the Pallas dw WINS at large low-intensity sites (RAFT's full/half-res
C≤96 encoders: backward −8.2%), so "auto" routes by shape class — see
``_auto_dw``; ``STEREOFORMER_DW_IMPL`` (trace-time env) and the
``dw_impl`` field override for A/B; all paths parity-tested.

Covers the argument surface the models use (stride, int/SAME padding,
dilation 1, use_bias, kernel/bias init, compute dtype).  NOT supported
vs ``flax.linen.Conv`` (asserted/erroring rather than silent): inputs
must be 4-D NHWC (no extra leading batch dims), no
``feature_group_count``, no ``kernel_dilation``, ``kernel_size`` must be
a (kh, kw) pair.  Reference counterpart: every ``nn.Conv2d`` inside the
trainers' backward (``train_file/trainer_DLC_GRU.py:212-213``).

Autodiff caveat: the "tap"/"pallas" dw routes are ``jax.custom_vjp``, so
forward-mode (``jax.jvp``/``jacfwd``) and higher-order autodiff through a
routed site raise where plain autodiff works; routing is shape- and
backend-dependent (TPU only), so the error appears only there.
``dw_impl="xla"`` (or ``STEREOFORMER_DW_IMPL=xla``) restores full
differentiability — the forward is identical.
"""

from __future__ import annotations

import os
from typing import Sequence, Union

import jax.numpy as jnp
import flax.linen as nn

from ..ops.convgrad import conv2d, resolve_padding


def _auto_dw(x_shape, kernel_hw, strides, padding) -> str:
    import jax

    env = os.environ.get("STEREOFORMER_DW_IMPL", "")
    if env in ("tap", "xla"):
        return env
    # Measured verdicts (scripts/_dw_bench.py + train_phase_bench A/B,
    # v5e bf16 B=4, BENCHMARKS.md "dw gradient formulation"): BOTH
    # reformulations are net in-model LOSSES on the flagship —
    #  - "tap" (XLA slice+matmul): vag 30.2 → 39.7 ms; the kh·kw
    #    materialised slices of x out-cost the removed transposes.
    #  - "pallas" (ops/pallas/dw_conv.py, one HBM read of x and g, taps
    #    in VMEM): vag 30.2 → 39.3 ms; the kernel matches XLA's dw conv
    #    *including* its transposes isolated (ratios 0.87-1.49x), so in
    #    the jitted model the ~100 custom-call boundaries only break
    #    XLA's surrounding fusions (~0.1 ms fixed cost each at 1/8-res
    #    shapes) — and the remote cold compile balloons 66 s → >30 min.
    # Default is therefore XLA autodiff; both alternates stay opt-in
    # (env var below), parity-tested, with the numbers in BENCHMARKS.md.
    kh, kw = kernel_hw
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    eligible = (
        strides == (1, 1)
        and kh % 2 == 1 and kw % 2 == 1
        and padding == ((ph, ph), (pw, pw))
        and x_shape[-1] >= 16
        and all(isinstance(d, int) for d in x_shape)
    )
    # forced-pallas A/B is still gated on the TPU backend: the dw kernel's
    # backward runs interpret=False, so on CPU/GPU the forward would work
    # and the failure would surface only at grad time
    if env == "pallas" and eligible and jax.default_backend() == "tpu":
        return "pallas"
    # Shape-class routing (the deciding variables are TENSOR SIZE and
    # arithmetic intensity, not module): at ≥~57k-pixel stride-1 C≤96
    # sites (RAFT's full/half-res encoders — the same low-intensity
    # class where the fused forward conv wins) the autodiff CHWN dw conv
    # is HBM-bound at 21-34 TF/s and the one-read Pallas dw kernel wins
    # (RAFT backward −8.2%, BENCHMARKS.md); at the flagship's ≤13k-pixel
    # 1/8-res sites the custom-call overhead dominates and XLA wins
    # (vag 30.2→39.3 ms), and its C≥128 big-pixel sites are
    # compute-bound where the kernel only ties (isolated 0.98-0.99×).
    # (Measured neutral on the current zoo beyond the FusedConv sites —
    # RAFT B=2 vag 180.9 → 180.7 ms, parity — kept as the principled
    # default for user models with large plain-Conv encoders.)
    if (
        eligible
        and jax.default_backend() == "tpu"
        and x_shape[1] * x_shape[2] >= 32768
        and x_shape[-1] <= 96
    ):
        return "pallas"
    return "xla"


class Conv(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence] = "SAME"
    use_bias: bool = True
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros
    dtype: object = None
    dw_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 4, (
            f"nn.Conv expects 4-D NHWC input, got shape {x.shape}; extra "
            f"leading batch dims (a flax.linen.Conv feature) are unsupported"
        )
        kh, kw = self.kernel_size
        C = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, C, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        dt = self.dtype or jnp.result_type(x, kernel)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        strides = (
            (self.strides, self.strides)
            if isinstance(self.strides, int) else tuple(self.strides)
        )
        pads = resolve_padding(self.padding, x.shape, (kh, kw), strides)
        dw = self.dw_impl
        if dw == "auto":
            dw = _auto_dw(x.shape, (kh, kw), strides, pads)
        y = conv2d(x, kernel, strides, pads, dw=dw)
        if bias is not None:
            y = y + bias.astype(dt)
        return y
