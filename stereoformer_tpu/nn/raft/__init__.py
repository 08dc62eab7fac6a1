"""RAFT-Stereo module layer."""

from .encoders import BasicEncoder, BottleneckBlock, MultiBasicEncoder, RaftResidualBlock
from .update import BasicMotionEncoder, ContextConvGRU, FlowHead, MultiUpdateBlock

__all__ = [
    "BasicEncoder",
    "BottleneckBlock",
    "MultiBasicEncoder",
    "RaftResidualBlock",
    "BasicMotionEncoder",
    "ContextConvGRU",
    "FlowHead",
    "MultiUpdateBlock",
]
