"""Flax module layer."""

from .conv import Conv
from .blocks import (
    ConvBnRelu,
    ConvLReLU,
    DeformBlock,
    DeformConv,
    FPNFusion,
    ResBlock,
    StemConv,
)
from .aggregation import ConvBn3D, Hourglass3D, cost_volume_pyramid
from .deform import (
    DeformConvV1,
    DeformConvV1Pack,
    DeformRoIPooling,
    DeformRoIPoolingPack,
    ModulatedDeformConv,
    ModulatedDeformNormal,
)
from .gru import ConvGRU, SepConvGRU
from .residual import ResSubmoduleAttention, SAModule
from .update import (
    GRUUpdate,
    GuidanceEncoder,
    LearnedBounds,
    OffsetHead,
    SmallUNet,
)

__all__ = [
    "Conv",
    "ConvBnRelu",
    "ConvLReLU",
    "DeformBlock",
    "DeformConv",
    "FPNFusion",
    "ResBlock",
    "StemConv",
    "ConvBn3D",
    "DeformConvV1",
    "DeformConvV1Pack",
    "DeformRoIPooling",
    "DeformRoIPoolingPack",
    "ModulatedDeformConv",
    "ModulatedDeformNormal",
    "Hourglass3D",
    "cost_volume_pyramid",
    "ResSubmoduleAttention",
    "SAModule",
    "ConvGRU",
    "SepConvGRU",
    "GRUUpdate",
    "GuidanceEncoder",
    "LearnedBounds",
    "OffsetHead",
    "SmallUNet",
]
