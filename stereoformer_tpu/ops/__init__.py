"""Pure functional op library (XLA reference implementations).

Pallas TPU kernels with identical APIs live in ``stereoformer_tpu.ops.pallas``
and are parity-tested against these.
"""

from .cost_volume import (
    concat_volume,
    correlation_volume,
    correlation_volume_matmul,
    correlation_volume_shift,
    difference_volume,
    gwc_volume,
)
from .softargmin import (
    disparity_variance,
    soft_argmin,
    soft_argmin_with_prob,
    uncertainty_volume,
)
from .local_volume import (
    fixed_local_cost_volume,
    local_soft_argmin,
    make_candidates,
    resample_volume,
    variance_local_cost_volume,
)
from .upsample import neighborhood9, upsample_convex, upsample_convex8, upsample_simple8
from .resize import resize_bilinear, scale_disp
from .warp import disp_warp, lr_warp_error
from .attention import banded_attention, banded_attention_scores
from .corr1d import (allpairs_corr1d, corr_block_cache, corr_lookup,
                     corr_pyramid)
from .deform import (
    bilinear_sample_2d,
    deform_columns,
    modulated_deform_conv,
    modulated_deform_conv_windowed,
)
from .deform_roi import deform_psroi_pool
from .pad import InputPadder, forward_interpolate, gauss_blur

__all__ = [
    "concat_volume",
    "correlation_volume",
    "correlation_volume_matmul",
    "correlation_volume_shift",
    "difference_volume",
    "gwc_volume",
    "disparity_variance",
    "soft_argmin",
    "soft_argmin_with_prob",
    "uncertainty_volume",
    "fixed_local_cost_volume",
    "local_soft_argmin",
    "make_candidates",
    "resample_volume",
    "variance_local_cost_volume",
    "neighborhood9",
    "upsample_convex",
    "upsample_convex8",
    "upsample_simple8",
    "resize_bilinear",
    "scale_disp",
    "disp_warp",
    "lr_warp_error",
    "banded_attention",
    "banded_attention_scores",
    "allpairs_corr1d",
    "corr_block_cache",
    "corr_lookup",
    "corr_pyramid",
    "deform_psroi_pool",
    "InputPadder",
    "forward_interpolate",
    "gauss_blur",
    "bilinear_sample_2d",
    "deform_columns",
    "modulated_deform_conv",
    "modulated_deform_conv_windowed",
]
