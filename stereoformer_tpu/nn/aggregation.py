"""3-D cost-volume aggregation (PSMNet-style) and multi-scale volumes.

Capability map to the reference:
- ``ConvBn3D`` / ``Hourglass3D`` — ``models/utils/submodule.py:76-128``
  (convbn_3d, hourglass3d encoder-decoder over [B, C, D, H, W]).
- ``disparity_regression``      — submodule.py:23-27 (≡ ops.soft_argmin).
- ``CostVolumePyramid``         — models/utils/cost.py:40-73 (full-range
  volumes at several feature scales).

Layout: 3-D volumes are [B, D, H, W, C] (channels innermost — a Conv with
3 spatial dims over (D, H, W) maps channels onto MXU lanes).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops import concat_volume, correlation_volume, difference_volume
from .blocks import he_normal


class ConvBn3D(nn.Module):
    """3-D conv + BN (+ optional ReLU) over [B, D, H, W, C]
    (submodule.py:76-80)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        # 3-D conv: stays on flax nn.Conv (the custom-dw Conv in
        # nn/conv.py is 2-D; these PSMNet-legacy 3-D volumes are not in
        # any reference model's train path)
        x = nn.Conv(
            self.features, (k, k, k), strides=self.stride,
            padding=k // 2, use_bias=False, kernel_init=he_normal(),
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class Hourglass3D(nn.Module):
    """3-D encoder-decoder with skip connections (submodule.py:92-128):
    two stride-2 encoder stages, two transpose-conv decoder stages; the
    decoder adds the matching encoder feature (presqu/postsqu skips)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.features
        down1 = ConvBn3D(f * 2, stride=2, dtype=self.dtype)(x, train)
        down1b = ConvBn3D(f * 2, dtype=self.dtype)(down1, train)
        down2 = ConvBn3D(f * 2, stride=2, dtype=self.dtype)(down1b, train)
        down2b = ConvBn3D(f * 2, dtype=self.dtype)(down2, train)
        up1 = nn.ConvTranspose(
            f * 2, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
            use_bias=False, kernel_init=he_normal(), dtype=self.dtype,
        )(down2b)
        up1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype)(up1)
        up1 = nn.relu(up1 + down1b)
        up2 = nn.ConvTranspose(
            f, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
            use_bias=False, kernel_init=he_normal(), dtype=self.dtype,
        )(up1)
        up2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype)(up2)
        return nn.relu(up2 + x)


def cost_volume_pyramid(
    left_feats: Sequence[jnp.ndarray],
    right_feats: Sequence[jnp.ndarray],
    max_disp: int,
    mode: str = "correlation",
):
    """Full-range volumes at each feature scale (cost.py:40-73): scale i
    uses max_disp / 2^i bins (finest first)."""
    out = []
    for i, (lf, rf) in enumerate(zip(left_feats, right_feats)):
        d = max(max_disp // (2**i), 1)
        if mode == "correlation":
            out.append(correlation_volume(lf, rf, d))
        elif mode == "concat":
            out.append(concat_volume(lf, rf, d))
        elif mode == "difference":
            out.append(difference_volume(lf, rf, d))
        else:
            raise ValueError(mode)
    return out
