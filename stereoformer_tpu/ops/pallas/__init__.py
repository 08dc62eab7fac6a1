"""Pallas TPU kernels — same APIs as the XLA reference ops in
``stereoformer_tpu.ops``, parity-tested against them (interpret mode on
CPU, compiled on TPU)."""

from .corr_band import corr_band
from .deform_sample import deform_conv_fused
from .local_refine import fused_local_soft_argmin

__all__ = ["corr_band", "deform_conv_fused", "fused_local_soft_argmin"]
