"""Spatial-attention residual disparity refiners.

Capability map to the reference ``models/utils/disp_residual.py``:
- ``SAModule``             — SA_Module (:401-417): conv-BN-ReLU ×2 →
  sigmoid attention map.
- ``ResSubmoduleAttention``— res_submodule_attention (:105-190): pool the
  images to the disparity's scale, warp-error map, spatial attention over
  [left, right, error, disp] (10ch), attention-gated encoder-decoder with
  1×1 redirect skips, scaled residual output.
- ``ResSubmoduleDeform``   — res_submodule_with_trans_deform (:193-279):
  the same refiner with a modulated deformable conv in the bottleneck.
- ``build_corr``           — disp_residual.py:9-19 ≡ ops.correlation_volume.

These are the residual-refinement heads usable on top of any model's
disparity (legacy in the reference, kept for capability parity).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from .conv import Conv

from ..ops import disp_warp, resize_bilinear
from .blocks import DeformConv, he_normal


def _avg_pool_pow2(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    if scale == 0:
        return x
    k = 2**scale
    return nn.avg_pool(x, (k, k), strides=(k, k))


class SAModule(nn.Module):
    """Sigmoid spatial-attention map (disp_residual.py:401-417)."""

    ndf: int = 16
    out: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        x = nn.relu(norm()(Conv(
            self.ndf, (1, 1), use_bias=False, kernel_init=he_normal(),
            dtype=self.dtype)(x)))
        x = nn.relu(norm()(Conv(
            self.ndf, (3, 3), padding=1, use_bias=False,
            kernel_init=he_normal(), dtype=self.dtype)(x)))
        x = Conv(self.out, (1, 1), use_bias=False, kernel_init=he_normal(),
                    dtype=self.dtype)(x)
        return nn.sigmoid(x)


class ResSubmoduleAttention(nn.Module):
    """Attention-gated residual refinement head
    (disp_residual.py:105-190).

    Inputs: full-res images, a disparity [B, H/2^s, W/2^s, 1] at scale
    ``scale``, and a feature map at the same scale; returns a residual to
    add to the disparity (already rescaled by 2^s as the reference's
    ``* scale``).  ``deform=True`` swaps the bottleneck conv for a
    modulated deformable conv (res_submodule_with_trans_deform).
    """

    scale: int
    out_planes: int = 64
    deform: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, left, right, disp, feature, train: bool = True):
        f = self.out_planes
        factor = left.shape[1] // disp.shape[1]
        left = _avg_pool_pow2(left, self.scale)
        right = _avg_pool_pow2(right, self.scale)
        if left.shape[1] != disp.shape[1]:  # guard for non-pow2 inputs
            left = resize_bilinear(left, disp.shape[1:3])
            right = resize_bilinear(right, disp.shape[1:3])
        disp_s = disp / factor
        left_rec, _ = disp_warp(right, disp_s)
        error_map = left_rec - left

        query = jnp.concatenate([left, right, error_map, disp_s], axis=-1)
        att = SAModule(dtype=self.dtype)(query, train=train)
        gated = att * jnp.concatenate([feature, query], axis=-1)

        def cbr(x, feats, k=3, s=1):
            x = Conv(feats, (k, k), strides=s, padding=k // 2,
                        use_bias=False, kernel_init=he_normal(),
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            return nn.relu(x)

        c1 = cbr(gated, f, s=2)
        c2 = cbr(c1, f * 2)
        c3 = cbr(c2, f * 4, s=2)
        if self.deform:
            c4 = DeformConv(f * 4, dtype=self.dtype)(c3)
            c4 = nn.relu(nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(c4))
        else:
            c4 = cbr(c3, f * 4)

        def up(x, feats):
            x = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 kernel_init=he_normal(), dtype=self.dtype)(x)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=self.dtype)(x)

        redir2 = Conv(f * 2, (1, 1), use_bias=False,
                         kernel_init=he_normal(), dtype=self.dtype)(c2)
        c5 = nn.relu(up(c4, f * 2) + redir2)
        redir1 = Conv(f, (1, 1), use_bias=False, kernel_init=he_normal(),
                         dtype=self.dtype)(gated)
        c6 = nn.relu(up(c5, f) + redir1)
        res = Conv(1, (1, 1), use_bias=False, kernel_init=he_normal(),
                      dtype=self.dtype)(c6)
        return res.astype(jnp.float32) * factor
