"""RAFT-Stereo encoders (NHWC Flax).

Capability map (models/IterativeLocalCostVolume/extractor/extractor.py):
- ``RaftResidualBlock``  — ResidualBlock (:6-60) with group/batch/instance/
  none normalisation.
- ``BasicEncoder``       — feature net (:122-201): instance-norm, output
  1/2^downsample, 256ch; the reference's left/right batch-concat trick
  (:176-197) is kept — one pass over the stacked pair.
- ``MultiBasicEncoder``  — context net (:203-324): batch-norm, per-scale
  (hidden, context) output heads at 1/4, 1/8, 1/16 (downsample=2).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
from ..conv import Conv
import jax
import jax.numpy as jnp
import numpy as np

from ..blocks import FusedConv

he_out = lambda: nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class WShardCtx:
    """Per-call context for exact W-sharded encoder evaluation
    (parallel/raft_wshard.py).

    Carries what the sample-local norms need to compute GLOBAL moments
    under overlap-and-discard slabs: the mesh axis to ``psum`` over, the
    slab-local offset of the first KEPT column (traced — edge slabs are
    clip-shifted), the kept width, and the slab width, all at INPUT
    resolution.  ``mask(w)`` scales the kept interval to any activation
    width ``w`` (the encoders only ever change W by power-of-two strides,
    so ``width // w`` is the cumulative stride).  Margin columns are
    masked out of the moments so each global pixel is counted by exactly
    one shard; the psum'd moments are then the true global statistics
    and the norm's elementwise apply is exact on every slab column whose
    receptive field the margin covers."""

    def __init__(self, axis_name: str, off, keep: int, width: int,
                 batch_axis: str | None = None):
        self.axis_name = axis_name
        self.off = off          # traced int32, multiple of the total stride
        self.keep = keep        # static
        self.width = width      # static
        # train-mode BatchNorm statistics reduce over the BATCH too; on a
        # DP × W-shard 2-D mesh they must psum over both axes (sample-
        # local norms never need this — their stats are per-sample)
        self.batch_axis = batch_axis

    def bn_axes(self):
        if self.batch_axis is None:
            return self.axis_name
        return (self.axis_name, self.batch_axis)

    def mask(self, w: int):
        f = self.width // w
        assert f * w == self.width, (self.width, w)
        ar = jnp.arange(w)
        lo = self.off // f
        return ((ar >= lo) & (ar < lo + self.keep // f)).astype(jnp.float32)


class GroupNormNHWC(nn.Module):
    """Group/instance norm that never reshapes the activation to 5-D.

    ``flax.linen.GroupNorm`` reshapes [N,H,W,C] -> [N,H,W,G,C/G] to reduce
    over group axes; on TPU the 5-D intermediate forces XLA layout copies
    around every norm (measured 65 ms/step of pure ``copy`` ops in the
    RAFT feature encoder at 576x960 — the norm tensors at 1/2 resolution
    are ~0.5 GB each and were copied twice per norm).  Instead we take
    per-channel moments over the spatial axes (one pass over the
    activation, fusable multi-output reduce), merge channels within each
    group on the tiny [N, C] moment tensors, and apply the affine as plain
    NHWC elementwise math that XLA fuses into the neighbouring
    conv/relu.  Matches flax.linen.GroupNorm (eps 1e-6, f32 stats,
    flax dtype-promotion semantics) to float rounding; parity-tested in
    tests/test_raft_stereo.py::TestGroupNormNHWC.
    """

    num_groups: int
    epsilon: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True
    dtype: object = None  # output dtype override (bf16 mixed precision)
    # For spatially-sharded inference (shard_map with H or W split over a
    # mesh axis): pmean the per-sample moments over ``axis_name`` so the
    # statistics are GLOBAL — the norm is then elementwise given the
    # stats, making a sharded apply bit-equal to the unsharded one with
    # no halo (the blocker for exact W/H-sharded RAFT encoders noted in
    # parallel/wshard.py; equal shard sizes are shard_map's invariant, so
    # the mean-of-means is the true mean).  Parity-tested on the 8-mesh.
    axis_name: object = None

    @nn.compact
    def __call__(self, x, stats_only: bool = False, keep_masks=None,
                 precomputed_sums=None):
        C = x.shape[-1]
        G = self.num_groups
        assert C % G == 0, (C, G)
        spatial = tuple(range(1, x.ndim - 1))
        if precomputed_sums is not None:
            # (Σx, Σx²) [N, C] f32 emitted by the producer conv kernel
            # (ops/pallas/conv2d.conv2d_fused_stats) — the stats pass
            # over x is skipped entirely.  Unsupported together with
            # masked/sharded moments (the kernel sums every column).
            assert keep_masks is None and self.axis_name is None
            s1, s2 = (p.astype(jnp.float32) for p in precomputed_sums)
            n_kept = float(np.prod([x.shape[d] for d in spatial]))
            return self._apply(x, s1 / n_kept, s2 / n_kept, stats_only)
        # Moments as dot_generals, not reduces.  A spatial `reduce` of a
        # conv-layout activation makes XLA materialise an f32 copy in the
        # reduce's preferred layout (571 MB + a layout copy per norm at
        # 4x576x960x64 — measured 8.3 ms/norm in-model); dots are
        # layout-flexible and accumulate in f32 straight from the bf16
        # activation in its native layout.
        #
        # ``keep_masks``: optional per-spatial-dim 0/1 vectors replacing
        # the ones-vectors — under shard_map with overlap-and-discard
        # slabs, mask the margin columns so each global pixel is counted
        # by exactly one shard; with ``axis_name`` the pmean is then a
        # weighted mean by kept count (exact global statistics).
        ones = []
        for i, d in enumerate(spatial):
            m = None if keep_masks is None else keep_masks[i]
            ones.append(
                jnp.ones((x.shape[d],), x.dtype) if m is None
                else m.astype(x.dtype)
            )
        n_kept = jnp.asarray(1.0, jnp.float32)
        for v in ones:
            n_kept = n_kept * jnp.sum(v.astype(jnp.float32))
        sub = "".join(chr(ord("h") + i) for i in range(len(spatial)))
        s1 = jnp.einsum(
            f"n{sub}c," + ",".join(sub) + "->nc", x, *ones,
            preferred_element_type=jnp.float32)
        if keep_masks is None:
            s2 = jnp.einsum(
                f"n{sub}c,n{sub}c->nc", x, x,
                preferred_element_type=jnp.float32)
        else:
            # fold the mask into one operand (x²·mask); the masked dims'
            # mask rides the first einsum operand
            xm = x
            for i, d in enumerate(spatial):
                if keep_masks[i] is not None:
                    shape = [1] * x.ndim
                    shape[d] = x.shape[d]
                    xm = xm * keep_masks[i].astype(x.dtype).reshape(shape)
            s2 = jnp.einsum(
                f"n{sub}c,n{sub}c->nc", xm, x,
                preferred_element_type=jnp.float32)
        if self.axis_name is not None:
            s1 = jax.lax.psum(s1, self.axis_name)
            s2 = jax.lax.psum(s2, self.axis_name)
            n_kept = jax.lax.psum(n_kept, self.axis_name)
        return self._apply(x, s1 / n_kept, s2 / n_kept, stats_only)

    def _apply(self, x, s1, s2, stats_only: bool):
        """Moments [N, C] (already count-normalised) → affine form or the
        applied norm; shared by the einsum-stats and the precomputed-
        (conv-kernel-emitted) paths."""
        C = x.shape[-1]
        G = self.num_groups
        m1 = s1.reshape(-1, G, C // G).mean(-1)              # [N, G]
        m2 = s2.reshape(-1, G, C // G).mean(-1)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)              # [N, G]
        mean_c = jnp.repeat(m1, C // G, axis=1)              # [N, C]
        inv_c = jnp.repeat(inv, C // G, axis=1)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (C,)
        params = []
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (C,))
            params.append(scale)
            inv_c = inv_c * scale[None, :]
        if stats_only:
            # affine form for a fused consumer prologue (nn.FusedConv):
            # y = x·s + t with s/t per-sample per-channel f32 [N, C]
            bias = (
                self.param("bias", nn.initializers.zeros, (C,))[None, :]
                if self.use_bias else 0.0
            )
            return inv_c, bias - mean_c * inv_c
        if self.dtype is not None:
            out_dtype = self.dtype
        else:
            out_dtype = jnp.result_type(x, *params) if params else x.dtype
        # stats stay f32 (above); the activation-sized elementwise math runs
        # in the OUTPUT dtype so mixed-precision mode never materialises an
        # f32 copy of a (potentially full-resolution) feature map
        cd = out_dtype
        y = (x.astype(cd) - mean_c.reshape(bshape).astype(cd)) * inv_c.reshape(
            bshape
        ).astype(cd)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (C,))
            params.append(bias)
            y = y + bias[None, :].astype(cd)
        return y.astype(out_dtype)


class _BNStats(nn.Module):
    """Eval-mode BatchNorm as its affine form (s, t) without applying —
    declares the exact parameter/variable tree ``flax.linen.BatchNorm``
    would (scale/bias params, batch_stats mean/var), so a module scope
    may take this path at eval and the real BatchNorm at train and
    checkpoints restore identically."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, batch):
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,)))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        inv = scale * jax.lax.rsqrt(var.value + self.epsilon)
        s = jnp.broadcast_to(inv[None, :], (batch, self.features))
        t = jnp.broadcast_to((bias - mean.value * inv)[None, :],
                             (batch, self.features))
        return s, t


class _Norm(nn.Module):
    """group | batch | instance | none (torch InstanceNorm2d has no affine
    params and no running stats)."""

    kind: str
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True, stats_only: bool = False,
                 wshard: WShardCtx | None = None, precomputed_sums=None):
        # wshard: W-sharded evaluation/training — the sample-local norms
        # (group/instance) psum margin-masked moments over the mesh axis
        # so their statistics are global-exact; eval BatchNorm is already
        # a fixed per-channel affine (elementwise, exact), and train
        # BatchNorm masks + pmeans its batch moments the same way (the
        # "batch" branch below).
        axis = wshard.axis_name if wshard is not None else None
        masks = (None, wshard.mask(x.shape[2])) if wshard is not None else None
        if self.kind == "group":
            return GroupNormNHWC(
                num_groups=self.features // 8, dtype=self.dtype,
                axis_name=axis, name="GroupNorm_0",
            )(x, stats_only=stats_only, keep_masks=masks,
              precomputed_sums=precomputed_sums)
        assert precomputed_sums is None or self.kind == "instance", (
            self.kind)
        if self.kind == "batch":
            if stats_only:
                if train:
                    return None  # train-mode batch stats stay unfused
                # eval BN is a fixed per-channel affine — fusable
                return _BNStats(self.features, name="BatchNorm_0")(x.shape[0])
            if wshard is not None and train:
                # Train-mode batch statistics under W-sharding (round-4
                # verdict #2): margin-mask the slab so each global column
                # is counted by exactly one shard, then pmean the per-
                # shard masked moments over the mesh axis (+ the batch
                # axis on a DP × W 2-D mesh).  Every shard keeps the SAME
                # count (N·H·Ws — shard_map's equal-shard invariant), so
                # flax's equal-weight pmean of masked means IS the global
                # mean; running-average updates then see the true global
                # batch stats on every shard (identical psums → the
                # updated batch_stats tree is replicated-consistent).
                # Reference: train-mode BN in the context encoder,
                # extractor/extractor.py:203-324.
                wm = wshard.mask(x.shape[2]) > 0.5          # bool [w]
                return nn.BatchNorm(
                    use_running_average=False, momentum=0.9,
                    dtype=self.dtype, axis_name=wshard.bn_axes(),
                    name="BatchNorm_0",
                )(x, mask=wm[None, None, :, None])
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="BatchNorm_0",
            )(x)
        if self.kind == "instance":
            return GroupNormNHWC(
                num_groups=self.features,
                use_bias=False,
                use_scale=False,
                dtype=self.dtype,
                axis_name=axis,
                name="GroupNorm_0",
            )(x, stats_only=stats_only, keep_masks=masks,
              precomputed_sums=precomputed_sums)
        if stats_only:
            return None
        return x


class RaftResidualBlock(nn.Module):
    features: int
    norm: str = "group"
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True,
                 wshard: WShardCtx | None = None):
        dt = self.dtype
        # Kernel-emitted norm moments (round 4): with sample-local norms
        # and no W-sharding, the fused convs also emit their output's
        # (Σy, Σy²) while the tile is in VMEM, deleting both norm stats
        # passes (full HBM re-reads of y — measured 0.75 ms per full-res
        # instance-norm site, RAFT eval 118.3 → 114.7 ms); value + grad
        # parity-tested (tests/test_pallas_conv2d.py,
        # tests/test_raft_stereo.py).
        import os

        # The stats entries are differentiable (custom VJP folds the
        # moment cotangents into the output cotangent: g = ȳ+s̄1+2y·s̄2),
        # so the fusion engages in BOTH modes — eval measured −3.0%
        # (RAFT 118.3 → 114.7 ms), train −1.1% (325.7 → 322.1 ms/step,
        # 300-step convergence checked).  Env escapes for A/B:
        # STEREOFORMER_STATS_FUSION=0 (eval), _TRAIN=0 (train).
        # CAVEAT: the env vars are read at TRACE time — flipping them
        # after the first jit trace of a given shape (or with a warm
        # persistent compile cache) has no effect on the cached
        # executable.  For an A/B, set the env before process start and
        # use distinct processes per arm (scripts/_conv_ab_hlo.py does).
        fuse_stats = wshard is None and self.norm in ("group", "instance") and (
            (not train
             and os.environ.get("STEREOFORMER_STATS_FUSION", "1") != "0")
            or (train
                and os.environ.get("STEREOFORMER_STATS_FUSION_TRAIN", "1")
                != "0")
        )
        # stride-1 3x3 convs route to the fused Pallas kernel on TPU
        # (FusedConv keeps nn.Conv's param tree; explicit names preserve
        # the auto-assigned Conv_0/Conv_1 so checkpoints restore as-is)
        sums1 = None
        if self.stride == 1:
            conv1 = FusedConv(self.features, 3, kernel_init=he_out(),
                              dtype=dt, name="Conv_0")
            if fuse_stats:
                y, sums1 = conv1(x, with_stats=True)
            else:
                y = conv1(x)
        else:
            y = Conv(self.features, (3, 3), strides=self.stride, padding=1,
                        kernel_init=he_out(), dtype=dt, name="Conv_0")(x)
        # conv1|norm|relu|conv2 seam: the norm+ReLU becomes conv2's
        # fused input prologue (FusedConv) — only the tiny [N,C] stats
        # are computed here, the normalised activation never reaches
        # HBM.  Sample-local norms fuse always; batch norm fuses at
        # EVAL (running stats = fixed affine) and returns None at train
        # (batch-stats computation + running-average updates stay on
        # the unfused path).
        norm1 = _Norm(self.norm, self.features, dt)
        st = norm1(y, train, stats_only=True, wshard=wshard,
                   precomputed_sums=sums1)
        conv2 = FusedConv(self.features, 3, kernel_init=he_out(), dtype=dt,
                          name="Conv_1")
        norm2 = _Norm(self.norm, self.features, dt)
        sums2 = None
        if st is not None:
            if fuse_stats:
                y, sums2 = conv2(y, prologue=st, with_stats=True)
            else:
                y = conv2(y, prologue=st)
        else:
            y = conv2(nn.relu(norm1(y, train, wshard=wshard)))
        y = norm2(y, train, wshard=wshard, precomputed_sums=sums2)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = Conv(self.features, (1, 1), strides=self.stride,
                        kernel_init=he_out(), dtype=dt, name="downsample")(x)
            x = _Norm(self.norm, self.features, dt)(x, train, wshard=wshard)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck (extractor.py:64-120)."""

    features: int
    norm: str = "group"
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        q = self.features // 4
        y = Conv(q, (1, 1), kernel_init=he_out(), dtype=dt)(x)
        y = nn.relu(_Norm(self.norm, q, dt)(y, train))
        y = Conv(q, (3, 3), strides=self.stride, padding=1,
                    kernel_init=he_out(), dtype=dt)(y)
        y = nn.relu(_Norm(self.norm, q, dt)(y, train))
        y = Conv(self.features, (1, 1), kernel_init=he_out(), dtype=dt)(y)
        y = nn.relu(_Norm(self.norm, self.features, dt)(y, train))
        if self.stride != 1:
            x = Conv(self.features, (1, 1), strides=self.stride,
                        kernel_init=he_out(), dtype=dt, name="downsample")(x)
            x = _Norm(self.norm, self.features, dt)(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Feature net → [B, H/2^d, W/2^d, output_dim] (instance norm)."""

    output_dim: int = 256
    norm: str = "instance"
    downsample: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True,
                 wshard: WShardCtx | None = None):
        d = self.downsample
        dt = self.dtype
        x = Conv(64, (7, 7), strides=1 + (d > 2), padding=3,
                    kernel_init=he_out(), dtype=dt)(x)
        x = nn.relu(_Norm(self.norm, 64, dt)(x, train, wshard=wshard))
        for i, (dim, stride) in enumerate(
            [(64, 1), (96, 1 + (d > 1)), (128, 1 + (d > 0))]
        ):
            x = RaftResidualBlock(dim, self.norm, stride, dtype=dt,
                                  name=f"layer{i+1}a")(x, train, wshard)
            x = RaftResidualBlock(dim, self.norm, 1, dtype=dt,
                                  name=f"layer{i+1}b")(x, train, wshard)
        return Conv(self.output_dim, (1, 1), kernel_init=he_out(),
                       dtype=dt)(x)


class MultiBasicEncoder(nn.Module):
    """Context net: per-scale (hidden, context) heads.

    Returns a list of ``num_layers`` (hidden, context) pairs, finest
    first (scale 1/2^d, then /2, then /4).
    """

    output_dims: Sequence[Sequence[int]] = ((128, 128, 128), (128, 128, 128))
    norm: str = "batch"
    downsample: int = 2
    num_layers: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True,
                 wshard: WShardCtx | None = None):
        d = self.downsample
        dt = self.dtype
        x = Conv(64, (7, 7), strides=1 + (d > 2), padding=3,
                    kernel_init=he_out(), dtype=dt)(x)
        x = nn.relu(_Norm(self.norm, 64, dt)(x, train, wshard=wshard))
        for i, (dim, stride) in enumerate(
            [(64, 1), (96, 1 + (d > 1)), (128, 1 + (d > 0))]
        ):
            x = RaftResidualBlock(dim, self.norm, stride, dtype=dt,
                                  name=f"layer{i+1}a")(x, train, wshard)
            x = RaftResidualBlock(dim, self.norm, 1, dtype=dt,
                                  name=f"layer{i+1}b")(x, train, wshard)

        outputs = []
        feats = [x]
        for lvl in range(1, self.num_layers):
            y = RaftResidualBlock(128, self.norm, 2, dtype=dt,
                                  name=f"down{lvl}a")(feats[-1], train, wshard)
            y = RaftResidualBlock(128, self.norm, 1, dtype=dt,
                                  name=f"down{lvl}b")(y, train, wshard)
            feats.append(y)
        for lvl, f in enumerate(feats):
            pair = []
            for head, dims in enumerate(self.output_dims):
                h = f
                if lvl < 2:  # finest two scales get an extra ResBlock head
                    h = RaftResidualBlock(
                        128, self.norm, 1, dtype=dt, name=f"out{lvl}_{head}_res"
                    )(h, train, wshard)
                h = FusedConv(dims[lvl], 3, kernel_init=he_out(), dtype=dt,
                              name=f"out{lvl}_{head}_conv")(h)
                pair.append(h)
            outputs.append(tuple(pair))
        return outputs
