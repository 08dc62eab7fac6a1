"""Flax module layer."""

from .blocks import (
    ConvBnRelu,
    ConvLReLU,
    DeformBlock,
    DeformConv,
    FPNFusion,
    ResBlock,
)
from .gru import ConvGRU, SepConvGRU
from .update import (
    GRUUpdate,
    GuidanceEncoder,
    LearnedBounds,
    OffsetHead,
    SmallUNet,
)

__all__ = [
    "ConvBnRelu",
    "ConvLReLU",
    "DeformBlock",
    "DeformConv",
    "FPNFusion",
    "ResBlock",
    "ConvGRU",
    "SepConvGRU",
    "GRUUpdate",
    "GuidanceEncoder",
    "LearnedBounds",
    "OffsetHead",
    "SmallUNet",
]
