"""Model zoo."""

from .low_cnn import ConvAffinityUpsample, LowCNN
from .raft_stereo import RAFTStereo
from .registry import available_models, get_model, register

__all__ = [
    "ConvAffinityUpsample",
    "LowCNN",
    "RAFTStereo",
    "available_models",
    "get_model",
    "register",
]
