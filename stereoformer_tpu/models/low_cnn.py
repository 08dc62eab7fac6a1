"""LowCNN — the local-cost-volume stereo model family (family A).

One Flax module covers the reference's six variants
(models/LocalCostVolume/baseline*.py — all share the identical backbone,
e.g. baseline_dynamic_gru.py:44-66, 87-118) via the ``refinement`` field:

  refinement            reference file                      outputs
  "none"                baseline.py (adaptive_refinement=F) [disp]
  "fixed"               baseline.py:38 (radius=2, 20)       [disp0, disp1]
  "variance"            baseline_var.py:39 (γ=1, 20)        [disp0, disp1]
  "learned"             baseline_dynamic.py:39              [disp0, disp1]
  "learned_supervised"  baseline_dynamic_supervised.py      [disp0, disp1] + bounds + disp_low
  "gru"                 baseline_dynamic_gru.py:40-41       list[iters]
  "gru_feature"         baseline_dynamic_gru2.py (updatev2) list[iters]

Backbone: siamese conv stack to 1/8 (7×7 s2 → ResBlock s2 → ResBlock s2),
three further ResBlocks to 1/8·256, 1/16·512, 1/32·512, top-down FPN
fusion to a single 1/8·256 feature, 24-bin correlation volume (MXU banded
matmul), 3 ResBlocks of aggregation, soft-argmin, then the variant's
refinement and learned 8× convex upsampling.

TPU notes: everything is NHWC with static shapes; the GRU iterations are
a statically-unrolled loop (12 small-conv steps — XLA fuses across
iterations; the reference unrolls through autograd the same way,
baseline_dynamic_gru.py:128-139).  Use ``jax.checkpoint`` around the
train-step loss for rematerialisation if memory-bound.

Deliberate deviation: the reference trainer accidentally trains with ONE
GRU iteration (``net(left, right, True)`` puts ``True`` in the ``iters``
slot, trainer_DLC_GRU.py:185 — SURVEY §3.1); here ``iters`` is always an
explicit integer (train default 12) so train and eval compute match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import ops
from ..nn.blocks import ConvLReLU, FPNFusion, ResBlock, he_normal
from ..nn.conv import Conv
from ..nn.update import GRUUpdate, LearnedBounds


class ConvAffinityUpsample(nn.Module):
    """conv-relu-conv → 8·8·9 convex-upsample mask logits, ×0.25
    (models/utils/upsample.py:6-19)."""

    hidden: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, feature):
        x = nn.relu(
            Conv(self.hidden, (3, 3), padding=1, kernel_init=he_normal(),
                    dtype=self.dtype)(feature)
        )
        return 0.25 * Conv(
            8 * 8 * 9, (1, 1), kernel_init=he_normal(), dtype=self.dtype
        )(x).astype(jnp.float32)


class LowCNN(nn.Module):
    max_disp: int = 192
    refinement: str = "gru"
    upsample: str = "convex"         # "convex" | "simple"
    cost_volume: str = "correlation"
    num_samples: int = 20
    gru_hidden: int = 32
    radius: float = 2.0
    gamma: float = 1.0
    dtype: object = None             # compute dtype; jnp.bfloat16 for MXU speed
    loop: str = "unroll"             # "unroll" | "scan" — GRU iteration style
    scan_unroll: int = 1             # loop="scan": lax.scan unroll factor.
    # Tested NEGATIVE result kept as a knob: measured no effect on train
    # or eval (BENCHMARKS.md "GRU loop modes" — eval's unroll win is DCE
    # of the 11 dead mask heads, train's gap is the scan backward's
    # per-step HBM residual spills; neither is reachable from a body
    # unroll window).  Numerics identical to loop="unroll" (tested).

    @nn.compact
    def __call__(
        self,
        left: jnp.ndarray,
        right: jnp.ndarray,
        iters: int = 12,
        train: bool = True,
    ) -> dict:
        """left/right: normalized images [B, H, W, 3] (H, W multiples of 8).

        Returns a dict:
          "disparities": list of full-resolution [B, H, W, 1] predictions
                         (loss is applied to the whole list).
          "disp_low":    the 1/8-scale initial disparity [B, H/8, W/8, 1].
          "bounds":      (lower, upper) at 1/8 for the supervised range
                         loss (learned_supervised only).
        """
        D = self.max_disp // 8
        dt = self.dtype

        # --- siamese backbone (shared weights) ---
        conv1 = ConvLReLU(64, kernel_size=7, stride=2, dtype=dt)
        conv2 = ResBlock(128, stride=2, dtype=dt)
        conv3 = ResBlock(256, stride=2, dtype=dt)
        down1 = ResBlock(256, stride=1, dtype=dt)
        down2 = ResBlock(512, stride=2, dtype=dt)
        down3 = ResBlock(512, stride=2, dtype=dt)
        fusion = FPNFusion(channels=(512, 512, 256), dtype=dt)

        def extract(img):
            x = conv1(img if dt is None else img.astype(dt), train=train)
            x = conv2(x, train=train)
            x = conv3(x, train=train)
            f8 = down1(x, train=train)
            f16 = down2(f8, train=train)
            f32 = down3(f16, train=train)
            return fusion([f32, f16, f8], train=train)

        # one batched pass over the stacked pair (RAFT's batch-concat trick,
        # extractor.py:176-197): half the kernel launches, better MXU
        # utilisation at small batch.  Train-mode BN statistics are computed
        # jointly over both views instead of per-view (the reference calls
        # the tower twice) — same spirit as its DataParallel statistics.
        feats = extract(jnp.concatenate([left, right], axis=0))
        feat_l, feat_r = jnp.split(feats, 2, axis=0)

        # --- 1/8 cost volume + aggregation + soft-argmin ---
        if self.cost_volume == "correlation":
            volume = ops.correlation_volume(feat_l, feat_r, D)
        elif self.cost_volume in ("concat", "concated"):
            # reference declares 'concated' (baseline_dynamic_gru.py:62-63)
            # but its [B,2C,D,H,W] output cannot feed the 24-channel
            # aggregation; here a learned per-bin similarity projection
            # makes the mode functional: [B,H,W,D,2C] -> [B,H,W,D]
            cvol = ops.concat_volume(feat_l, feat_r, D)
            proj = nn.Dense(64, kernel_init=he_normal(), dtype=dt,
                            name="concat_proj1")(cvol)
            proj = nn.relu(proj)
            volume = nn.Dense(1, kernel_init=he_normal(), dtype=dt,
                              name="concat_proj2")(proj)[..., 0]
        else:
            raise ValueError(f"unknown cost_volume {self.cost_volume!r}")
        for i in range(3):
            volume = ResBlock(D, dtype=dt, name=f"agg{i}")(volume, train=train)
        # probability/refinement math is precision-sensitive: back to f32
        volume = volume.astype(jnp.float32)
        disp_low = ops.soft_argmin(volume)[..., None]     # [B, H/8, W/8, 1]

        def up(disp, mask):
            if self.upsample == "convex":
                return ops.upsample_convex8(disp, mask)
            return ops.upsample_simple8(disp)

        out: dict = {"disp_low": disp_low}

        if self.refinement in ("gru", "gru_feature"):
            feature_dim = 64 if self.refinement == "gru_feature" else 0
            gru_dim = 2 * self.gru_hidden + feature_dim
            lf = feat_l if feature_dim else None
            # the guidance encoder consumes the images at 1/8; downscale
            # once instead of once per iteration (identical values — the
            # reference recomputes this inside every update, update.py:73-80)
            B, H8, W8 = disp_low.shape[:3]
            left8 = ops.resize_bilinear(left, (H8, W8), align_corners=False)
            right8 = ops.resize_bilinear(right, (H8, W8), align_corners=False)
            prob = jax.nn.softmax(volume, axis=-1)  # loop-invariant

            if self.loop == "scan":
                # lax.scan over the iterations: the update traces ONCE
                # (compile time ∝ 1 iteration instead of `iters`; memory
                # handled by scan's native rematerialisation structure).
                # Identical numerics to the unrolled loop (tested).
                # batch_stats are carried (sequentially updated, like the
                # unrolled loop) in train mode, read-only-broadcast in eval
                scan_cls = nn.scan(
                    GRUUpdate,
                    variable_broadcast="params" if train else ("params", "batch_stats"),
                    variable_carry="batch_stats" if train else False,
                    split_rngs={"params": False},
                    length=iters,
                    in_axes=nn.broadcast,
                    methods=["scan_step"],
                    unroll=self.scan_unroll,
                )
                scan_update = scan_cls(
                    hidden=self.gru_hidden,
                    num_samples=self.num_samples,
                    with_mask=True,
                    feature_dim=feature_dim,
                    dtype=dt,
                    name="gru_update",
                )
                # derive the zero init from disp_low (still exactly zero)
                # instead of a fresh jnp.zeros: under shard_map a literal
                # carry init is "unvarying" while the carry output varies
                # over the mesh axis, which fails lax.scan's typing —
                # deriving from a device-varying array sidesteps it and
                # keeps the model usable inside wsharded eval
                hidden0 = jnp.broadcast_to(
                    (disp_low * 0).astype(jnp.float32 if dt is None else dt),
                    (B, H8, W8, gru_dim),
                )
                (_, _), (disps, masks) = scan_update.scan_step(
                    (disp_low, hidden0), volume, left8, right8, lf, train,
                    prob,
                )
                # disps/masks: [T, B, H8, W8, ...] → upsample per step
                preds = [up(disps[t], masks[t]) for t in range(iters)]
            else:
                update = GRUUpdate(
                    hidden=self.gru_hidden,
                    num_samples=self.num_samples,
                    with_mask=True,
                    feature_dim=feature_dim,
                    dtype=dt,
                    name="gru_update",
                )
                disp, hidden = disp_low, None
                preds = []
                for _ in range(iters):
                    disp, hidden, mask = update(
                        volume, disp, left8, right8, hidden,
                        left_feature=lf, train=train, prob=prob,
                    )
                    preds.append(up(disp, mask))
            out["disparities"] = preds
            return out

        # non-GRU variants share one affinity mask from the left feature
        mask = (
            ConvAffinityUpsample(dtype=dt)(feat_l)
            if self.upsample == "convex" else None
        )
        if self.refinement == "none":
            out["disparities"] = [up(disp_low, mask)]
            return out
        if self.refinement == "fixed":
            refined = ops.fixed_local_cost_volume(
                volume, disp_low, self.radius, self.num_samples,
                consider_valid=True,
            )
        elif self.refinement == "variance":
            refined = ops.variance_local_cost_volume(
                volume, disp_low, self.gamma, self.num_samples,
                consider_valid=True,
            )
        elif self.refinement in ("learned", "learned_supervised"):
            supervised = self.refinement == "learned_supervised"
            refined, bounds = LearnedBounds(
                num_samples=self.num_samples, relative=supervised
            )(volume, disp_low, left, right, train=train,
              consider_valid=not supervised)
            if supervised:
                out["bounds"] = bounds
        else:
            raise ValueError(f"unknown refinement {self.refinement!r}")
        out["disparities"] = [up(disp_low, mask), up(refined, mask)]
        return out
