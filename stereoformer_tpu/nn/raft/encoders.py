"""RAFT-Stereo encoders (NHWC Flax).

Capability map (models/IterativeLocalCostVolume/extractor/extractor.py):
- ``RaftResidualBlock``  — ResidualBlock (:6-60) with group/batch/instance/
  none normalisation.
- ``BasicEncoder``       — feature net (:122-201): instance-norm, output
  1/2^downsample, 256ch; the reference's left/right batch-concat trick
  (:176-197) is kept — one pass over the stacked pair.
- ``MultiBasicEncoder``  — context net (:203-324): batch-norm, per-scale
  (hidden, context) output heads at 1/4, 1/8, 1/16 (downsample=2).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

he_out = lambda: nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class _Norm(nn.Module):
    """group | batch | instance | none (torch InstanceNorm2d has no affine
    params and no running stats)."""

    kind: str
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "group":
            return nn.GroupNorm(num_groups=self.features // 8)(x)
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        if self.kind == "instance":
            return nn.GroupNorm(
                num_groups=self.features, use_bias=False, use_scale=False
            )(x)
        return x


class RaftResidualBlock(nn.Module):
    features: int
    norm: str = "group"
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    kernel_init=he_out())(x)
        y = _Norm(self.norm, self.features)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, kernel_init=he_out())(y)
        y = _Norm(self.norm, self.features)(y, train)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        kernel_init=he_out(), name="downsample")(x)
            x = _Norm(self.norm, self.features)(x, train)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck (extractor.py:64-120)."""

    features: int
    norm: str = "group"
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        q = self.features // 4
        y = nn.Conv(q, (1, 1), kernel_init=he_out())(x)
        y = nn.relu(_Norm(self.norm, q)(y, train))
        y = nn.Conv(q, (3, 3), strides=self.stride, padding=1, kernel_init=he_out())(y)
        y = nn.relu(_Norm(self.norm, q)(y, train))
        y = nn.Conv(self.features, (1, 1), kernel_init=he_out())(y)
        y = nn.relu(_Norm(self.norm, self.features)(y, train))
        if self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        kernel_init=he_out(), name="downsample")(x)
            x = _Norm(self.norm, self.features)(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Feature net → [B, H/2^d, W/2^d, output_dim] (instance norm)."""

    output_dim: int = 256
    norm: str = "instance"
    downsample: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.downsample
        x = nn.Conv(64, (7, 7), strides=1 + (d > 2), padding=3,
                    kernel_init=he_out())(x)
        x = nn.relu(_Norm(self.norm, 64)(x, train))
        for i, (dim, stride) in enumerate(
            [(64, 1), (96, 1 + (d > 1)), (128, 1 + (d > 0))]
        ):
            x = RaftResidualBlock(dim, self.norm, stride, name=f"layer{i+1}a")(x, train)
            x = RaftResidualBlock(dim, self.norm, 1, name=f"layer{i+1}b")(x, train)
        return nn.Conv(self.output_dim, (1, 1), kernel_init=he_out())(x)


class MultiBasicEncoder(nn.Module):
    """Context net: per-scale (hidden, context) heads.

    Returns a list of ``num_layers`` (hidden, context) pairs, finest
    first (scale 1/2^d, then /2, then /4).
    """

    output_dims: Sequence[Sequence[int]] = ((128, 128, 128), (128, 128, 128))
    norm: str = "batch"
    downsample: int = 2
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.downsample
        x = nn.Conv(64, (7, 7), strides=1 + (d > 2), padding=3,
                    kernel_init=he_out())(x)
        x = nn.relu(_Norm(self.norm, 64)(x, train))
        for i, (dim, stride) in enumerate(
            [(64, 1), (96, 1 + (d > 1)), (128, 1 + (d > 0))]
        ):
            x = RaftResidualBlock(dim, self.norm, stride, name=f"layer{i+1}a")(x, train)
            x = RaftResidualBlock(dim, self.norm, 1, name=f"layer{i+1}b")(x, train)

        outputs = []
        feats = [x]
        for lvl in range(1, self.num_layers):
            y = RaftResidualBlock(128, self.norm, 2, name=f"down{lvl}a")(feats[-1], train)
            y = RaftResidualBlock(128, self.norm, 1, name=f"down{lvl}b")(y, train)
            feats.append(y)
        for lvl, f in enumerate(feats):
            pair = []
            for head, dims in enumerate(self.output_dims):
                h = f
                if lvl < 2:  # finest two scales get an extra ResBlock head
                    h = RaftResidualBlock(
                        128, self.norm, 1, name=f"out{lvl}_{head}_res"
                    )(h, train)
                h = nn.Conv(dims[lvl], (3, 3), padding=1, kernel_init=he_out(),
                            name=f"out{lvl}_{head}_conv")(h)
                pair.append(h)
            outputs.append(tuple(pair))
        return outputs
