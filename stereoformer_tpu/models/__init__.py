"""Model zoo."""

from .low_cnn import ConvAffinityUpsample, LowCNN
from .registry import available_models, get_model, register

__all__ = [
    "ConvAffinityUpsample",
    "LowCNN",
    "available_models",
    "get_model",
    "register",
]
