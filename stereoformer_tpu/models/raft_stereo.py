"""RAFTStereo — the iterative all-pairs correlation family (family B).

Re-design of ``models/IterativeLocalCostVolume/raft_stereo.py:63-199``:
context net (per-scale hidden/context heads) + shared feature net at
1/2^downsample, all-pairs 1D epipolar correlation pyramid (one MXU matmul
per row), and an N-iteration multi-scale GRU cascade whose flow update is
constrained to the epipolar line (Δflow_y = 0, raft_stereo.py:180),
finished by a learned convex 2^downsample× upsample.

Inputs are raw 0..255 RGB (normalised to [-1, 1] internally,
raft_stereo.py:132-133) — unlike LowCNN, which takes ImageNet-normalised
images; this mirrors the reference's split behaviour.

The iteration loop is statically unrolled under jit; ``test_mode`` only
upsamples the final iteration (raft_stereo.py:182-183).

Structured as setup-style stages (``encode`` → ``context_gates`` →
``update``) so the W-sharded driver (parallel/raft_wshard.py) can apply
each stage on its own slab/window geometry via ``apply(method=...)``;
``__call__`` composes the same stages, so the parameter tree is identical
to the original single-method form (names cnet / fnet / context_zqr{i} /
update_block).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from ..nn.conv import Conv

from .. import ops
from ..nn.raft.encoders import BasicEncoder, MultiBasicEncoder, he_out
from ..nn.raft.update import MultiUpdateBlock


class RAFTStereo(nn.Module):
    hidden_dims: Sequence[int] = (128, 128, 128)
    downsample: int = 2
    corr_levels: int = 4
    corr_radius: int = 4
    n_gru_layers: int = 3
    # "raw": inputs are 0..255 RGB (the reference convention,
    # raft_stereo.py:132); "imagenet": inputs are ImageNet-normalised (the
    # shared data pipeline / DisparityTrainer convention) and are converted
    # back to the [-1, 1] range the encoders expect.
    input_norm: str = "raw"
    # compute dtype for encoders/GRU convs (bf16 for MXU speed + half the
    # HBM traffic through the full-resolution fnet norms); params, the
    # correlation accumulation, coordinates, flow head and mask softmax
    # stay f32 (repo mixed-precision convention).
    dtype: object = None
    # checkpoint (jax.checkpoint / nn.remat) each GRU-cascade iteration:
    # the backward recomputes the update block instead of storing its
    # internals for all `iters` iterations.  At the 12-iteration train
    # config the un-checkpointed step's activation footprint pushes XLA
    # into ITS OWN HLO rematerialisation of the encoders — recomputing
    # the full-res stem convs and re-reading encoder activations at
    # ~320 GiB/s (BENCHMARKS "round-4 roofline") — so explicit
    # checkpointing HERE trades cheap 1/4-res recompute against XLA's
    # expensive full-res recompute.  Parameter tree is unchanged (lifted
    # transform), so checkpoints load identically.
    remat_update: bool = False

    def setup(self):
        self.cnet = MultiBasicEncoder(
            output_dims=(tuple(self.hidden_dims), tuple(self.hidden_dims)),
            norm="batch", downsample=self.downsample,
            num_layers=self.n_gru_layers, dtype=self.dtype,
        )
        self.fnet = BasicEncoder(
            output_dim=256, norm="instance", downsample=self.downsample,
            dtype=self.dtype,
        )
        # per-scale context gate bias convs (raft_stereo.py:148); attribute
        # names carry the parameter-tree names
        for i in range(self.n_gru_layers):
            setattr(self, f"context_zqr{i}", Conv(
                self.hidden_dims[i] * 3, (3, 3), padding=1, dtype=self.dtype,
                kernel_init=he_out(),
            ))
        # static_argnums count self as 0 (flax subtracts 1 internally):
        # the iterXX/update/need_mask bools and interp_fn drive Python
        # control flow inside the block
        cls = nn.remat(MultiUpdateBlock, static_argnums=(5, 6, 7, 8, 9, 10)) \
            if self.remat_update else MultiUpdateBlock
        self.update_block = cls(
            hidden_dims=tuple(self.hidden_dims),
            corr_levels=self.corr_levels,
            corr_radius=self.corr_radius,
            n_gru_layers=self.n_gru_layers,
            n_downsample=self.downsample,
            dtype=self.dtype,
        )

    def _normalize(self, left, right):
        if self.input_norm == "imagenet":
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            return (2.0 * (left * std + mean) - 1.0,
                    2.0 * (right * std + mean) - 1.0)
        return 2.0 * (left / 255.0) - 1.0, 2.0 * (right / 255.0) - 1.0

    def encode(self, left, right, train: bool = True, wshard=None):
        """Context + feature encoders on raw images.

        Returns (cnet_list, fmap1, fmap2).  ``wshard`` (a
        ``nn.raft.encoders.WShardCtx``) makes the sample-local norm
        statistics global-exact under W-sharded slabs."""
        left, right = self._normalize(left, right)
        cnet_list = self.cnet(left, train=train, wshard=wshard)
        # batch-concat trick (extractor.py:176-197): one pass, then split
        fmaps = self.fnet(jnp.concatenate([left, right], axis=0),
                          train=train, wshard=wshard)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        return cnet_list, fmap1, fmap2

    def context_gates(self, inp):
        """Per-scale (cz, cr, cq) GRU gate biases from the relu'd context
        features (raft_stereo.py:148)."""
        out = []
        for i, c in enumerate(inp):
            z = getattr(self, f"context_zqr{i}")(c)
            out.append(tuple(jnp.split(z, 3, axis=-1)))
        return out

    def update(self, net, ctx, corr_feat, flow, need_mask: bool = True,
               interp_fn=None):
        """One GRU-cascade step (see nn/raft/update.MultiUpdateBlock).

        Positional call: under ``remat_update`` the static arguments must
        be positional for ``nn.remat``'s static_argnums."""
        return self.update_block(net, ctx, corr_feat, flow,
                                 True, True, True, True,
                                 need_mask, interp_fn)

    def __call__(
        self,
        left: jnp.ndarray,
        right: jnp.ndarray,
        iters: int = 12,
        flow_init: Optional[jnp.ndarray] = None,
        test_mode: bool = False,
        train: bool = True,
    ):
        cnet_list, fmap1, fmap2 = self.encode(left, right, train=train)

        net = [jnp.tanh(h) for h, _ in cnet_list]
        inp = [nn.relu(c) for _, c in cnet_list]
        ctx = self.context_gates(inp)

        corr = ops.allpairs_corr1d(fmap1, fmap2)          # [B,H,W,W2]
        if self.dtype is not None:
            # corr is accumulated in f32 (preferred_element_type); store the
            # pyramid in the compute dtype — the per-iteration windowed
            # lookup is HBM-bandwidth-bound on the [B,H,W,W2] volume.
            corr = corr.astype(self.dtype)
        pyramid = ops.corr_pyramid(corr, self.corr_levels)
        # blocked-overlap views, built once: the per-iteration windowed
        # lookup reads ~2× the pyramid instead of (2r+2)× (ops/corr1d.py).
        # Eval only — the blocked VJP's per-iteration [.., nq, slabw]
        # cotangent measured +5 ms on the train step (A/B round 5), while
        # eval gains 4-5% (B=2 114.8→110, B=8 359→345 @ 576×960)
        corr_cache = (None if train
                      else ops.corr_block_cache(pyramid, self.corr_radius))

        B, H4, W4, _ = net[0].shape
        coords0 = jnp.broadcast_to(
            jnp.arange(W4, dtype=jnp.float32)[None, None, :], (B, H4, W4)
        )
        coords1 = coords0
        flow_y = jnp.zeros((B, H4, W4, 1))
        if flow_init is not None:
            coords1 = coords1 + flow_init[..., 0]

        factor = 2 ** self.downsample
        preds = []
        for itr in range(iters):
            # per-iteration detach, as the reference (raft_stereo.py:172)
            coords1 = jax.lax.stop_gradient(coords1)
            corr_feat = ops.corr_lookup(pyramid, coords1, self.corr_radius,
                                        cache=corr_cache)
            flow = jnp.concatenate(
                [(coords1 - coords0)[..., None], flow_y], axis=-1
            )
            net, mask, delta = self.update(
                net, ctx, corr_feat, flow,
                need_mask=not test_mode or itr == iters - 1,
            )
            # epipolar constraint: Δflow_y = 0 (raft_stereo.py:180)
            coords1 = coords1 + delta[..., 0]
            if test_mode and itr < iters - 1:
                continue
            flow_up = ops.upsample_convex(
                (coords1 - coords0)[..., None], mask, factor
            )
            # matching geometry: the right-image match sits at w − d, so the
            # epipolar flow converges to −disparity; negate so outputs are
            # positive disparities like the rest of the zoo (the reference
            # returns raw flow and was never trained in-repo,
            # raft_stereo.py:190-199)
            preds.append(-flow_up)

        out = {
            "disparities": preds,
            "flow_low": (coords1 - coords0)[..., None],
            "disp_low": -(coords1 - coords0)[..., None],
        }
        return out
