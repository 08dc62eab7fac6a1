"""Model zoo."""

from .low_cnn import ConvAffinityUpsample, LowCNN
from .cross_attention import CrossAttentionStereo
from .raft_stereo import RAFTStereo
from .registry import available_models, get_model, register

__all__ = [
    "ConvAffinityUpsample",
    "LowCNN",
    "CrossAttentionStereo",
    "RAFTStereo",
    "available_models",
    "get_model",
    "register",
]
