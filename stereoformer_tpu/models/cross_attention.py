"""CrossAttentionStereo — the epipolar cross-attention family (family C).

The reference repo is *named* StereoFormer and has a
``models/CrossAttentionCostVolume/`` package, but its
``cross_attention_cost_volume.py`` is an empty file (SURVEY §2.6) — only
the group-wise correlation helper exists.  This model realises the
declared capability, TPU-first:

- shared siamese backbone to 1/8 (same stack as LowCNN — the families
  share ops by design),
- learned Q/K/V projections; multi-head *banded* epipolar attention
  (ops/attention.py): scores = per-head correlation band (MXU matmul),
  attended right feature = D-term shifted blend,
- the score band (heads·D channels) is fused with the attended/left
  features into a D-channel cost volume by 1×1 convs + ResBlock
  aggregation, then soft-argmin + the same GRU local-cost-volume
  refinement and convex 8× upsampling as family A.

Outputs match the LowCNN dict contract so trainers / losses are shared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from ..nn.conv import Conv

from .. import ops
from ..nn.blocks import ConvLReLU, FPNFusion, ResBlock, he_normal
from ..nn.update import GRUUpdate


class CrossAttentionStereo(nn.Module):
    max_disp: int = 192
    num_heads: int = 8
    qk_dim: int = 128
    upsample: str = "convex"
    num_samples: int = 20
    gru_hidden: int = 32
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        left: jnp.ndarray,
        right: jnp.ndarray,
        iters: int = 12,
        train: bool = True,
    ) -> dict:
        D = self.max_disp // 8
        dt = self.dtype

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

        # batched siamese pass (see LowCNN)
        feats = extract(jnp.concatenate([left, right], axis=0))
        feat_l, feat_r = jnp.split(feats, 2, axis=0)

        # --- cross-attention cost volume at 1/8 ---
        proj = lambda name: Conv(
            self.qk_dim, (1, 1), kernel_init=he_normal(), dtype=dt, name=name
        )
        q = proj("proj_q")(feat_l)
        k = proj("proj_k")(feat_r)
        v = Conv(128, (1, 1), kernel_init=he_normal(), dtype=dt,
                    name="proj_v")(feat_r)
        scores, attended = ops.banded_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), D, self.num_heads,
        )
        B, H8, W8 = scores.shape[:3]
        score_feat = scores.reshape(B, H8, W8, D * self.num_heads)

        # fuse score band + attended-right + left context into D channels
        ctx = jnp.concatenate(
            [score_feat,
             attended,
             feat_l.astype(jnp.float32)],
            axis=-1,
        )
        volume = Conv(2 * D, (1, 1), kernel_init=he_normal(), dtype=dt,
                         name="fuse1")(ctx)
        volume = nn.relu(volume)
        volume = Conv(D, (3, 3), padding=1, kernel_init=he_normal(),
                         dtype=dt, name="fuse2")(volume)
        for i in range(3):
            volume = ResBlock(D, dtype=dt, name=f"agg{i}")(volume, train=train)
        volume = volume.astype(jnp.float32)
        disp_low = ops.soft_argmin(volume)[..., None]

        update = GRUUpdate(
            hidden=self.gru_hidden, num_samples=self.num_samples,
            with_mask=True, dtype=dt,
        )
        # hoist the per-iteration image downscale + prob (see LowCNN)
        left8 = ops.resize_bilinear(left, (H8, W8), align_corners=False)
        right8 = ops.resize_bilinear(right, (H8, W8), align_corners=False)
        prob = jax.nn.softmax(volume, axis=-1)
        disp, hidden = disp_low, None
        preds = []
        for _ in range(iters):
            disp, hidden, mask = update(
                volume, disp, left8, right8, hidden, train=train, prob=prob
            )
            if self.upsample == "convex":
                preds.append(ops.upsample_convex8(disp, mask))
            else:
                preds.append(ops.upsample_simple8(disp))
        return {"disparities": preds, "disp_low": disp_low}
