"""Local cost-volume refinement modules (the model-family-A variants).

Capability map to the reference (all in models/LocalCostVolume/Attempts/):
- ``GuidanceEncoder``      — BasicGuidanceNet (update.py:52-92): encodes the
  photometric error map (warp right→left by cur_disp) and the
  "uncertainty volume" p·d·(d−μ)² into 2·hidden channels.
- ``OffsetHead``           — OffsetPredictionHead (update.py:96-105):
  conv-relu-conv-relu → 2 channels (lower/upper range offsets, ≥0).
- ``GRUUpdate``            — DisparityUpdateDLC{,WithMask} (update.py:109-316)
  and the v2 variant conditioned on the left 1/8 feature
  (updatev2.py:169-251): one ConvGRU step → bounds (+ convex-upsample
  mask), then candidates → resample → local soft-argmin.
- ``SmallUNet`` / ``LearnedBounds`` — pure_learning_method.py:35-143 and
  pure_learning_method_w_super.py (bounds relative to cur_disp + returned
  for the range loss).

All NHWC; volumes [B, H, W, D]; disparities [B, H, W, 1].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    disp_warp,
    local_soft_argmin,
    make_candidates,
    resize_bilinear,
    uncertainty_volume,
)
from .blocks import DeformBlock, ResBlock, he_normal
from .conv import Conv
from .gru import ConvGRU


def _images_at(disp: jnp.ndarray, left: jnp.ndarray, right: jnp.ndarray):
    """Downscale full-res images to the disparity's resolution
    (update.py:73-80, bilinear align_corners=False)."""
    H, W = disp.shape[1:3]
    if left.shape[2] != W:
        left = resize_bilinear(left, (H, W), align_corners=False)
        right = resize_bilinear(right, (H, W), align_corners=False)
    return left, right


class GuidanceEncoder(nn.Module):
    """Error-map + uncertainty-volume encoder → 2·hidden channels
    (update.py:52-92).  The warp / probability statistics stay f32;
    the encoder convs run in ``dtype``."""

    hidden: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, volume, cur_disp, left, right, train: bool = True,
                 prob=None):
        # ``prob`` (softmax of the full volume) is loop-invariant across
        # GRU iterations — callers may precompute it once
        if prob is None:
            prob = jax.nn.softmax(volume, axis=-1)
        left, right = _images_at(cur_disp, left, right)
        warped_left, _ = disp_warp(right, cur_disp)
        error_map = warped_left - left
        uncert = uncertainty_volume(prob, cur_disp)

        def enc(x, name):
            x = Conv(
                self.hidden, (3, 3), padding=1, use_bias=False,
                kernel_init=he_normal(), dtype=self.dtype, name=name,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name=name + "_bn",
            )(x)
            return nn.relu(x)

        err_f = enc(error_map, "error_encoder")
        unc_f = enc(uncert, "uncertain_encoder")
        return jnp.concatenate([err_f, unc_f], axis=-1)


class OffsetHead(nn.Module):
    """conv-relu-conv-relu → 2 non-negative range offsets
    (update.py:96-105)."""

    hidden: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden, (3, 3), padding=1,
                            kernel_init=he_normal(), dtype=self.dtype)(x))
        out = nn.relu(Conv(2, (3, 3), padding=1,
                              kernel_init=he_normal(), dtype=self.dtype)(x))
        return out.astype(jnp.float32)  # bounds are coordinates: keep f32


class GRUUpdate(nn.Module):
    """One GRU refinement step: guidance → ConvGRU → bounds (+ mask) →
    dynamic local cost volume → refined disparity.

    ``with_mask`` adds the 9·64-channel convex-upsample mask head
    (update.py:259-262, scaled ×0.25).  ``feature_dim > 0`` is the v2
    variant: a conv-BN-ReLU encoding of the left 1/8 feature is
    concatenated into the GRU input (updatev2.py:181-205).
    """

    hidden: int = 32
    num_samples: int = 20
    with_mask: bool = True
    feature_dim: int = 0
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        volume: jnp.ndarray,
        cur_disp: jnp.ndarray,
        left: jnp.ndarray,
        right: jnp.ndarray,
        hidden_state: Optional[jnp.ndarray],
        left_feature: Optional[jnp.ndarray] = None,
        train: bool = True,
        consider_valid: bool = True,
        prob: Optional[jnp.ndarray] = None,
    ):
        D = volume.shape[-1]
        feats = GuidanceEncoder(hidden=self.hidden, dtype=self.dtype)(
            volume, cur_disp, left, right, train=train, prob=prob
        )
        gru_dim = 2 * self.hidden + self.feature_dim
        if self.feature_dim:
            lf = Conv(
                self.feature_dim, (3, 3), padding=1, use_bias=False,
                kernel_init=he_normal(), dtype=self.dtype, name="feature_encode",
            )(left_feature)
            lf = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="feature_encode_bn",
            )(lf)
            feats = jnp.concatenate([feats, nn.relu(lf)], axis=-1)
        hidden_state = ConvGRU(hidden_dim=gru_dim, dtype=self.dtype)(
            feats, hidden_state
        )

        mask = None
        if self.with_mask:
            m = nn.relu(
                Conv(256, (3, 3), padding=1, kernel_init=he_normal(),
                        dtype=self.dtype, name="mask_conv1")(hidden_state)
            )
            mask = 0.25 * Conv(
                64 * 9, (1, 1), kernel_init=he_normal(), dtype=self.dtype,
                name="mask_conv2",
            )(m).astype(jnp.float32)

        bounds = OffsetHead(dtype=self.dtype)(hidden_state)
        lower = cur_disp - bounds[..., 0:1]
        upper = cur_disp + bounds[..., 1:2]
        cands = make_candidates(
            lower, upper, cur_disp, self.num_samples, D,
            consider_valid=consider_valid,
        )
        disp = local_soft_argmin(volume, cands)
        return disp, hidden_state, mask

    def scan_step(self, carry, volume, left, right, left_feature, train,
                  prob):
        """lax.scan-shaped wrapper: carry = (disp, hidden); per-step
        outputs = (disp, mask).  Use via
        ``nn.scan(GRUUpdate, methods=...)`` (see LowCNN loop="scan")."""
        disp, hidden = carry
        disp, hidden, mask = self(
            volume, disp, left, right, hidden,
            left_feature=left_feature, train=train, prob=prob,
        )
        return (disp, hidden), (disp, mask)


class SmallUNet(nn.Module):
    """Offset-prediction net of the learned-bounds variant
    (pure_learning_method.py:35-75): two conv-BN-ReLU encoders →
    ResBlock → DeformBlock → conv-ReLU → 2 offsets."""

    hidden: int = 32

    @nn.compact
    def __call__(self, error_map, uncert_volume, train: bool = True):
        def enc(x, name):
            x = Conv(
                self.hidden, (3, 3), padding=1, use_bias=False,
                kernel_init=he_normal(), name=name,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=name + "_bn"
            )(x)
            return nn.relu(x)

        e = enc(error_map, "error_encoder")
        u = enc(uncert_volume, "uncertain_encoder")
        x = jnp.concatenate([e, u], axis=-1)
        x = ResBlock(self.hidden)(x, train=train)
        x = DeformBlock(self.hidden // 2)(x, train=train)
        off = nn.relu(Conv(2, (3, 3), padding=1, kernel_init=he_normal())(x))
        return off[..., 0:1], off[..., 1:2]


class LearnedBounds(nn.Module):
    """Learned-bounds local cost volume (pure_learning_method.py:79-143).

    ``relative=False``: the two UNet outputs are used directly as absolute
    [lower, upper] (the unsupervised variant).  ``relative=True``: bounds
    are cur_disp ∓/± offsets and are also returned for the supervised
    range loss (pure_learning_method_w_super.py:111-145).
    """

    num_samples: int = 20
    relative: bool = False

    @nn.compact
    def __call__(
        self, volume, cur_disp, left, right,
        train: bool = True, consider_valid: bool = False,
    ):
        D = volume.shape[-1]
        prob = jax.nn.softmax(volume, axis=-1)
        left, right = _images_at(cur_disp, left, right)
        warped_left, _ = disp_warp(right, cur_disp)
        error_map = warped_left - left
        uncert = uncertainty_volume(prob, cur_disp)
        lo_off, up_off = SmallUNet()(error_map, uncert, train=train)
        if self.relative:
            lower = cur_disp - lo_off
            upper = cur_disp + up_off
        else:
            lower, upper = lo_off, up_off
        cands = make_candidates(
            lower, upper, cur_disp, self.num_samples, D,
            consider_valid=consider_valid,
        )
        disp = local_soft_argmin(volume, cands)
        return disp, (lower, upper)
