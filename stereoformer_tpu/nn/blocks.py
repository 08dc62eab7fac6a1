"""Reusable Flax building blocks (NHWC).

Capability map to the reference:
- ``ConvLReLU``    — ``models/utils/disp_residual.py:11-23`` (conv [+BN] + LeakyReLU 0.1)
- ``ConvBnRelu``   — ``models/utils/feature_fusion.py:84-96`` (BaseLayer)
- ``ResBlock``     — ``models/BasicBlocks/resnet.py:20-48``
- ``DeformConv``   — ``deform/modules/modulated_deform_conv.py:68-103``
  (ModulatedDeformConvPack: offsets+mask predicted by a zero-initialised
  conv, then the Pallas/XLA deformable sampling op)
- ``DeformBlock``  — ``models/BasicBlocks/resnet.py:51-79``
- ``FPNFusion``    — ``models/utils/feature_fusion.py:99-125``
  ("TransformerConcated": top-down upsample→concat→conv fusion)

BatchNorm uses flax running stats (torch momentum 0.1 ⇒ flax momentum 0.9);
under SPMD data parallelism with jit+NamedSharding the batch statistics are
global automatically (XLA inserts the cross-device reductions for the
batch-axis mean), so no axis_name plumbing is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    modulated_deform_conv,
    modulated_deform_conv_windowed,
    resize_bilinear,
)
from .conv import Conv

he_normal = nn.initializers.he_normal


class FusedConv(nn.Module):
    """Drop-in ``nn.Conv`` (stride 1, SAME zero pad, NHWC) routed to the
    fused Pallas conv kernel on TPU (``ops/pallas/conv2d.py``; measured
    1.7x XLA plain at 64ch full res / 2.5x with the fused residual+ReLU
    epilogue, plus norm-prologue fusion via ``prologue=``).  Off-TPU (CPU test mesh, multichip dryrun) it lowers to the
    plain XLA conv, and gradients are the XLA conv gradients on every
    backend (the kernel's custom VJP differentiates the XLA form).

    The parameter tree (``kernel``/``bias`` leaf names, shapes, init) is
    identical to ``nn.Conv(features, (k, k), padding=k//2)`` so existing
    checkpoints restore transparently — pass ``name="Conv_0"`` etc. when
    substituting an auto-named ``nn.Conv``.
    """

    features: int
    kernel_size: int = 3
    relu: bool = False           # fuse a ReLU epilogue
    kernel_init: object = nn.initializers.lecun_normal()
    dtype: object = None         # compute dtype (bf16 for mixed precision)
    impl: str = "auto"           # auto | pallas | xla
    # sites where the conv has no norm consumer (so XLA has nothing to
    # fuse the conv WITH) can raise the auto-routing channel ceiling to
    # 128 — the kernel wins the isolated conv there (1.07-1.44x)
    auto_max_c: int = 96

    @nn.compact
    def __call__(self, x, residual=None, prologue=None,
                 with_stats: bool = False):
        # with_stats: additionally return the output's per-sample channel
        # moments (Σy, Σy²) [B, Co] f32, emitted by the kernel while the
        # output tile is still in VMEM — the consumer norm's stats pass
        # (a full HBM re-read of y) is deleted.  Differentiable (the
        # moments' cotangents fold into the output cotangent inside the
        # custom VJP); returns (y, None) when the call routes to XLA so
        # callers can fall back.  Policy (eval default-on, train opt-in)
        # lives at the call sites (RaftResidualBlock).
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or jnp.result_type(x, kernel)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        bias = bias.astype(dt)
        residual = None if residual is None else residual.astype(dt)
        if prologue is not None:
            # producer norm+ReLU applied as this conv's input transform:
            # in = relu(x·s + t), s/t per-sample per-channel f32 [B, C]
            assert residual is None
            s, t = (p.astype(jnp.float32) for p in prologue)
        # auto: the pad-free kernel beats XLA's *isolated* conv emitter
        # up to C=128 (64ch full-res 1.7x, 96ch half-res 1.26x, 128ch
        # 1.07-1.44x) and ties at 256 — but in-model XLA fuses a conv
        # with its norm/ReLU consumers, which flips C>=128 back in XLA's
        # favour (RAFT eval: 122.6 ms with C<=96 vs 125.3 with C<=128);
        # C<64 underfills the MXU contraction.  Measured v5e, see
        # ops/pallas/conv2d.py.
        use_pallas = self.impl == "pallas" or (
            self.impl == "auto"
            and jax.default_backend() == "tpu"
            and 64 <= x.shape[-1] <= self.auto_max_c
            # symbolic dims (jax.export shape polymorphism) cannot drive
            # a Pallas grid — those traces take the XLA path
            and all(isinstance(d, int) for d in x.shape)
        )
        if use_pallas:
            from ..ops.pallas.conv2d import (
                conv2d_fused,
                conv2d_fused_prologue,
                conv2d_fused_prologue_stats,
                conv2d_fused_stats,
            )

            if with_stats:
                assert residual is None
                if prologue is not None:
                    y, s1, s2 = conv2d_fused_prologue_stats(
                        x, kernel, bias, s, t, self.relu)
                else:
                    y, s1, s2 = conv2d_fused_stats(x, kernel, bias, self.relu)
                return y, (s1, s2)
            if prologue is not None:
                return conv2d_fused_prologue(x, kernel, bias, s, t, self.relu)
            return conv2d_fused(x, kernel, bias, residual, self.relu)
        if with_stats:
            # XLA fallback: no kernel-emitted moments — caller computes
            # stats the normal way
            if prologue is not None:
                x = jnp.maximum(
                    x.astype(jnp.float32) * s[:, None, None, :]
                    + t[:, None, None, :], 0.0,
                ).astype(dt)
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), [((k - 1) // 2,) * 2] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            if residual is not None:
                y = y + residual
            return (nn.relu(y) if self.relu else y), None
        if prologue is not None:
            x = jnp.maximum(
                x.astype(jnp.float32) * s[:, None, None, :]
                + t[:, None, None, :], 0.0,
            ).astype(dt)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [((k - 1) // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        if residual is not None:
            y = y + residual
        return nn.relu(y) if self.relu else y


class ConvLReLU(nn.Module):
    """conv(+BN) + LeakyReLU(0.1) — reference ``conv`` helper."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bn: bool = False
    dtype: object = None  # compute dtype (bf16 for mixed precision)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=(self.kernel_size - 1) // 2,
            use_bias=not self.use_bn,
            kernel_init=he_normal(),
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class StemConv(nn.Module):
    """The 7×7 stride-2 RGB stem (reference ``conv(3, 64, 7, 2)``)
    computed via space-to-depth: a 3-channel 7×7 conv starves the MXU
    (contraction dim 3·49), so the input is rearranged to 2×2 blocks
    (12 channels at half resolution) and convolved 4×4 stride-1 with the
    zero-padded, block-rearranged kernel — *bit-equivalent* output
    (tested).  Parameters keep the plain (7, 7, 3, C) layout so
    checkpoints are interchangeable with an ordinary conv stem.

    Measured on v5e f32 it is ~2.5% SLOWER than the plain conv (XLA's own
    stem handling is already good; the s2d reshapes cost more than the
    matmul gain), so the models use the plain stem — kept as a building
    block for bf16/other-shape experiments.
    """

    features: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        w = self.param(
            "kernel", he_normal(), (7, 7, C, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        dt = self.dtype or x.dtype
        # out[i,j] uses x rows 2i−3..2i+3; shift to an even-aligned 8-tap
        # window 2i−4..2i+3 by zero-padding the kernel at tap 0
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))      # [8,8,C,F]
        # W4[dy', dx', (py,px,c)] = W8[2dy'+py, 2dx'+px, c]
        w4 = (
            w8.reshape(4, 2, 4, 2, C, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, self.features)
        )
        # space-to-depth with matching padding: x-rows −4..H+3
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        Hp, Wp = xp.shape[1:3]
        s2d = (
            xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp // 2, Wp // 2, 4 * C)
        )
        out = jax.lax.conv_general_dilated(
            s2d.astype(dt), w4.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # VALID over (Hp/2 − 3) rows = H/2 + 1; drop the trailing row/col
        out = out[:, : H // 2, : W // 2, :] + b.astype(dt)
        return nn.leaky_relu(out, negative_slope=0.1)


class ConvBnRelu(nn.Module):
    """conv3x3 + BN + ReLU — reference BaseLayer."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=self.kernel_size // 2,
            use_bias=False,
            kernel_init=he_normal(),
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """conv-BN-ReLU + conv-BN with 1×1-conv-BN shortcut when shape changes
    (resnet.py:20-48). Final ReLU after the residual add."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        conv = lambda f, k, s, name=None: Conv(
            f, (k, k), strides=s, padding=(k - 1) // 2 if k > 1 else 0,
            kernel_init=he_normal(), dtype=self.dtype, name=name,
        )
        residual = x
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = conv(self.features, 1, self.stride, "shortcut_conv")(x)
            residual = norm()(residual)
        # NOT routed to the Pallas conv kernel: in-model XLA fuses each
        # conv with its BatchNorm+ReLU consumers here and beats the
        # kernel (measured: flagship eval 260 -> 249 pairs/s with
        # FusedConv in these blocks, despite the kernel winning the
        # isolated [16,144,240,128] conv 1.24x).  The RAFT encoders'
        # group/instance norms don't give XLA the same fusion, which is
        # where FusedConv lives (nn/raft/encoders.py).
        out = conv(self.features, self.kernel_size, self.stride)(x)
        out = norm()(out)
        out = nn.relu(out)
        out = conv(self.features, 3, 1)(out)
        out = norm()(out)
        return nn.relu(out + residual)


class DeformConv(nn.Module):
    """Modulated deformable conv "Pack": offsets and modulation mask come
    from a zero-initialised conv on the input, then the deformable sampling
    op + matmul.  Replaces the reference's CUDA DCNv2 extension
    (modulated_deform_conv.py:68-103; kernel pipeline
    deform/src/cuda/modulated_deform_conv_cuda.cu:20-110).

    ``window``: offsets clamped to a static ±window px range, enabling the
    gather-free ``modulated_deform_conv_windowed`` form (measured 3.5-7.7×
    faster on TPU v5e; see BENCHMARKS.md §deform).  Deliberate deviation —
    the reference never clamps its (zero-initialised, small-in-practice)
    offsets; ``window=None`` restores exact unbounded semantics through
    the gather form.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    window: Optional[int] = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        K = k * k
        C = x.shape[-1]
        # offset/mask conv is zero-initialised so the op starts as a plain
        # conv with 0.5 modulation (ModulatedDeformConvPack.init_offset);
        # offsets stay f32 (sub-pixel coordinates are precision-sensitive)
        om = Conv(
            3 * K,
            (k, k),
            strides=self.stride,
            padding=self.padding,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_mask",
        )(x.astype(jnp.float32))
        offsets = om[..., : 2 * K].reshape(*om.shape[:-1], K, 2)
        mask = nn.sigmoid(om[..., 2 * K :])
        weight = self.param(
            "weight", he_normal(), (K * C, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.window is not None and self.stride != 1:
            # the windowed dense form is formulated for stride 1; falling
            # back silently would change numerics vs the stride-1 blocks
            raise ValueError(
                "DeformConv: window-clamped form supports stride=1 only; "
                "pass window=None for strided deformable convs (exact "
                "unbounded gather semantics)."
            )
        if self.window is not None and self.stride == 1:
            out = modulated_deform_conv_windowed(
                x.astype(jnp.float32),
                offsets,
                mask,
                weight,
                bias,
                kernel_size=k,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                window=self.window,
            )
        else:
            out = modulated_deform_conv(
                x.astype(jnp.float32),
                offsets,
                mask,
                weight,
                bias,
                kernel_size=k,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
            )
        return out if self.dtype is None else out.astype(self.dtype)


class DeformBlock(nn.Module):
    """ResBlock whose second conv is a modulated deformable conv
    (resnet.py:51-79)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        residual = x
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = Conv(
                self.features, (1, 1), strides=self.stride,
                kernel_init=he_normal(), dtype=self.dtype, name="shortcut_conv",
            )(x)
            residual = norm()(residual)
        out = Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=1,
            kernel_init=he_normal(),
            dtype=self.dtype,
        )(x)
        out = norm()(out)
        out = nn.relu(out)
        out = DeformConv(self.features, dtype=self.dtype)(out)
        out = norm()(out)
        return nn.relu(out + residual)


class FPNFusion(nn.Module):
    """Top-down feature fusion over [1/32, 1/16, 1/8] features
    (feature_fusion.py:99-125): upsample ×2 (align_corners=True) → concat
    skip → conv-BN-ReLU, returning the finest-level fused map."""

    channels: Sequence[int]  # coarse-to-fine, e.g. (512, 512, 256)
    dtype: object = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = True):
        out = features[0]
        for i in range(len(self.channels) - 1):
            skip = features[i + 1]
            H, W = skip.shape[1:3]
            out = resize_bilinear(out, (H, W), align_corners=True)
            out = jnp.concatenate([out, skip.astype(out.dtype)], axis=-1)
            out = ConvBnRelu(self.channels[i + 1], dtype=self.dtype)(out, train=train)
        return out
