"""Deformable-conv / deformable-RoI Flax module wrappers — the §2.8 tail.

These close the reference's module-layer inventory for the deform
extension.  None of them is reachable from any reference *model* (the
models only use ``ModulatedDeformConvPack`` semantics, covered by
``nn.blocks.DeformConv``); they exist so a user of the reference's module
surface finds the same capabilities here:

- ``ModulatedDeformConv``   — deform/modules/modulated_deform_conv.py:14-66
  (explicit offset+mask inputs, DCNv2)
- ``ModulatedDeformNormal`` — deform/modules/modulated_deform_conv.py:105-151
  (offsets/mask predicted from a SECOND feature map — e.g. a surface-normal
  feature — by a zero-initialised conv; sampling applied to the first)
- ``DeformConvV1``          — deform/modules/deform_conv.py:14-64
  (v1 deformable conv: explicit offsets, no modulation mask)
- ``DeformConvV1Pack``      — deform/modules/deform_conv.py:66-99
  (offsets from a zero-initialised conv on the input)
- ``DeformRoIPooling``      — deform/modules/deform_psroi_pooling.py:13-46
- ``DeformRoIPoolingPack``  — deform/modules/deform_psroi_pooling.py:50-130
  (RoI-align → 3-layer FC offset/mask head (zero-init last) → offset
  pooling, output modulated by the mask)

All wrap the tested ops in ``ops/deform.py`` / ``ops/deform_roi.py``
(gradients by autodiff, FD-gradchecked there).  Conventions follow the
repo: NHWC activations; offsets ``[B, Ho, Wo, K, 2]`` as (dy, dx);
deform weights flattened ``[K*C, Cout]`` tap-major.  Deliberate
deviations from the torch wrappers, documented here once: parameter init
is ``he_normal``/zeros (torch: kaiming_uniform(a=√5) + fan-in uniform
bias — a constant-factor init-scale difference only), and the
``lr_mult=0.1`` attribute on the offset convs is not reproduced (optax
learning-rate partitioning via ``train/params.py`` filters covers the
capability; the reference never consumes ``lr_mult`` either).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn
from .conv import Conv

from ..ops import modulated_deform_conv
from ..ops.deform_roi import deform_psroi_pool
from .blocks import he_normal


class ModulatedDeformConv(nn.Module):
    """DCNv2 with caller-supplied offsets and modulation mask
    (modulated_deform_conv.py:14-66): owns only the conv weight/bias.

    ``__call__(x, offsets, mask)`` with x ``[B, H, W, C]``, offsets
    ``[B, Ho, Wo, K, 2]`` (dy, dx), mask ``[B, Ho, Wo, K]`` (already
    sigmoid-activated, as the torch module expects).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, offsets, mask):
        k = self.kernel_size
        C = x.shape[-1]
        weight = self.param(
            "weight", he_normal(), (k * k * C, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        out = modulated_deform_conv(
            x.astype(jnp.float32), offsets, mask, weight, bias,
            kernel_size=k, stride=self.stride, padding=self.padding,
            dilation=self.dilation,
        )
        return out if self.dtype is None else out.astype(self.dtype)


class ModulatedDeformNormal(nn.Module):
    """DCNv2 whose offsets/mask are predicted from a *second* feature map
    (modulated_deform_conv.py:105-151): ``__call__(input_feature,
    normal_feature)`` — the zero-initialised offset/mask conv reads
    ``normal_feature`` while sampling and the conv weight apply to
    ``input_feature``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, input_feature, normal_feature):
        k = self.kernel_size
        K = k * k
        C = input_feature.shape[-1]
        # offsets stay f32 (sub-pixel coordinates are precision-sensitive)
        om = Conv(
            3 * K, (k, k), strides=self.stride, padding=self.padding,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_mask",
        )(normal_feature.astype(jnp.float32))
        offsets = om[..., : 2 * K].reshape(*om.shape[:-1], K, 2)
        mask = nn.sigmoid(om[..., 2 * K:])
        weight = self.param(
            "weight", he_normal(), (K * C, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        out = modulated_deform_conv(
            input_feature.astype(jnp.float32), offsets, mask, weight, bias,
            kernel_size=k, stride=self.stride, padding=self.padding,
            dilation=self.dilation,
        )
        return out if self.dtype is None else out.astype(self.dtype)


class DeformConvV1(nn.Module):
    """v1 deformable conv (deform_conv.py:14-64): explicit offsets, no
    modulation mask — ``modulated_deform_conv(mask=None)``."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, offsets):
        k = self.kernel_size
        C = x.shape[-1]
        weight = self.param(
            "weight", he_normal(), (k * k * C, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        out = modulated_deform_conv(
            x.astype(jnp.float32), offsets, None, weight, bias,
            kernel_size=k, stride=self.stride, padding=self.padding,
            dilation=self.dilation,
        )
        return out if self.dtype is None else out.astype(self.dtype)


class DeformConvV1Pack(nn.Module):
    """v1 "Pack": offsets predicted by a zero-initialised conv on the
    input (deform_conv.py:66-99) — starts as a plain (unmodulated) conv.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        K = k * k
        off = Conv(
            2 * K, (k, k), strides=self.stride, padding=self.padding,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x.astype(jnp.float32))
        offsets = off.reshape(*off.shape[:-1], K, 2)
        return DeformConvV1(
            self.features, kernel_size=k, stride=self.stride,
            padding=self.padding, dilation=self.dilation,
            use_bias=self.use_bias, dtype=self.dtype, name="deform",
        )(x, offsets)


class DeformRoIPooling(nn.Module):
    """Deformable PS-RoI pooling module (deform_psroi_pooling.py:13-46):
    a thin stateless wrapper over ``ops.deform_roi.deform_psroi_pool``.

    ``__call__(features, rois, offsets)`` — features ``[B, H, W, C]``,
    rois ``[N, 5]`` (batch_idx, x1, y1, x2, y2), offsets
    ``[N, P, P, 2]`` (Δx, Δy) or None (``no_trans``).
    """

    pooled_size: int = 7
    spatial_scale: float = 1.0
    trans_std: float = 0.0
    sample_per_part: int = 4
    no_trans: bool = False

    @nn.compact
    def __call__(self, features, rois, offsets=None):
        if self.no_trans:
            offsets = None
        return deform_psroi_pool(
            features, rois, offsets,
            pooled_size=self.pooled_size,
            spatial_scale=self.spatial_scale,
            trans_std=self.trans_std,
            sample_per_part=self.sample_per_part,
        )


class DeformRoIPoolingPack(nn.Module):
    """Deformable PS-RoI pooling "Pack" (deform_psroi_pooling.py:50-130):
    RoI-align first (no offsets), predict per-bin offsets + mask with a
    3-layer FC head (last layer zero-initialised), pool again with the
    offsets, modulate by the sigmoid mask.
    """

    pooled_size: int = 7
    spatial_scale: float = 1.0
    trans_std: float = 0.0
    sample_per_part: int = 4
    no_trans: bool = False
    deform_fc_dim: int = 1024

    @nn.compact
    def __call__(self, features, rois):
        P = self.pooled_size
        pool = lambda off: deform_psroi_pool(
            features, rois, off,
            pooled_size=P, spatial_scale=self.spatial_scale,
            trans_std=self.trans_std, sample_per_part=self.sample_per_part,
        )
        if self.no_trans:
            return pool(None)
        N = rois.shape[0]
        roi = pool(None)                                   # [N, P, P, C]
        x = roi.reshape(N, -1)
        x = nn.relu(nn.Dense(self.deform_fc_dim, kernel_init=he_normal())(x))
        x = nn.relu(nn.Dense(self.deform_fc_dim, kernel_init=he_normal())(x))
        om = nn.Dense(
            P * P * 3, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="offset_mask_fc",
        )(x).reshape(N, 3, P, P)
        # channel order follows the CUDA kernel's trans layout: 0 = Δx,
        # 1 = Δy (deform_psroi_pooling_cuda.cu trans_x/trans_y reads)
        offsets = jnp.stack([om[:, 0], om[:, 1]], axis=-1)  # [N, P, P, 2]
        mask = nn.sigmoid(om[:, 2])[..., None]              # [N, P, P, 1]
        return pool(offsets) * mask
