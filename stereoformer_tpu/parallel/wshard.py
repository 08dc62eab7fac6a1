"""Width-sharded (image-W) cost-volume pipeline — the long-context
analogue for stereo.

The reference has no sequence parallelism (SURVEY §5: the workload's
"length" axes are image width W and disparity range D; correlation is
all-pairs along W, corr.py:104-111).  This module makes that scaling axis
real on a TPU mesh: the epipolar correlation band

    out[b, h, w, d] = mean_c  left[b,h,w,c] * right[b,h,w-d,c]   (0 if w<d)

only ever looks *leftward* up to D−1 columns, so a W-sharded layout needs
exactly ONE halo exchange — each device receives its left neighbor's last
D−1 right-feature columns via a non-circular ``lax.ppermute`` riding the
ICI (device 0's missing source arrives as zeros, which reproduces the
unsharded w<d zero band exactly).  Everything downstream — soft-argmin,
candidate generation and the local cost-volume resampling
(Attempts/update.py:326-345 semantics) — is W-local, so the whole
initial-disparity + local-refinement pipeline runs sharded with one
collective total.

This is ring-attention-shaped communication (neighbor halo instead of
all-gather) as sketched in ops/corr1d.py; values are bit-identical to the
unsharded ops (tested on the virtual 8-device mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fixed_local_cost_volume, soft_argmin


def _band_local(left: jnp.ndarray, right_ext: jnp.ndarray,
                max_disp: int) -> jnp.ndarray:
    """Correlation band for a W-slab given a left-extended right block.

    left: [B, H, Ws, C]; right_ext: [B, H, Ws + D − 1, C] whose first
    D−1 columns are the halo (global columns w0−D+1 … w0−1).  Returns
    [B, H, Ws, D] with out[..., w, d] = mean_c l[w]·r_ext[w + D−1 − d]
    — a rectangular one-hot selector einsum (gather-free, MXU-ridden;
    see ops/cost_volume.py:_band_from_square for why not take_along_axis).
    """
    C = left.shape[-1]
    D = max_disp
    Ws = left.shape[2]
    sim = jnp.einsum(
        "bhwc,bhvc->bhwv", left, right_ext,
        preferred_element_type=jnp.float32,
    ) / jnp.asarray(C, left.dtype)                     # [B, H, Ws, Ws+D-1]
    w_idx = jnp.arange(Ws)[:, None, None]              # [Ws, 1, 1]
    v_idx = jnp.arange(Ws + D - 1)[None, :, None]      # [1, Ws+D-1, 1]
    d_idx = jnp.arange(D)[None, None, :]               # [1, 1, D]
    selector = (w_idx + D - 1 - v_idx == d_idx).astype(sim.dtype)
    return jnp.einsum(
        "bhwv,wvd->bhwd", sim, selector,
        preferred_element_type=jnp.float32,
    ).astype(left.dtype)


def _halo_from_left(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Send each device's last ``halo`` W-columns to its right neighbor.

    Non-circular: device 0 receives zeros (ppermute semantics for an
    index with no source) — exactly the unsharded out-of-range band.
    """
    n = jax.lax.axis_size(axis_name)
    tail = x[:, :, x.shape[2] - halo :, :]
    return jax.lax.ppermute(
        tail, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )


def correlation_volume_wsharded(
    left: jnp.ndarray, right: jnp.ndarray, max_disp: int, axis_name: str
) -> jnp.ndarray:
    """W-sharded correlation volume; call INSIDE shard_map with the W axis
    of ``left``/``right`` partitioned over ``axis_name``.

    Per-shard inputs [B, H, Ws, C] → per-shard volume [B, H, Ws, D].
    One ppermute halo exchange; the contraction itself is local MXU work.

    Requires a shard width Ws ≥ D−1 (the halo reaches at most one
    neighbor; use fewer devices along ``axis_name`` for very small W).
    """
    Ws = right.shape[2]
    if Ws < max_disp - 1:
        raise ValueError(
            f"W shard width {Ws} < max_disp-1 = {max_disp - 1}: the "
            f"correlation halo would span more than one neighbor device. "
            f"Shard W over fewer devices (need Ws >= {max_disp - 1})."
        )
    if max_disp <= 1:
        return _band_local(left, right, max_disp)
    halo = _halo_from_left(right, max_disp - 1, axis_name)
    right_ext = jnp.concatenate([halo, right], axis=2)
    return _band_local(left, right_ext, max_disp)


def make_wsharded_model_eval(
    mesh: Mesh,
    apply_fn,
    out_width: int,
    margin: int,
    axis_name: str = "data",
):
    """Full-model W-sharded inference by overlap-and-discard.

    Each device runs the UNMODIFIED model on its W-slab extended by
    ``margin`` columns per side (8-aligned so every internal ÷8 resize is
    phase-consistent with the global computation), then keeps only the
    central slab — exact wherever ``margin`` covers the model's receptive
    field plus the disparity reach (≈ backbone RF + 8·max_disp/8 input
    px; parity-tested).  Applicability: the LowCNN family's correlation
    is D-banded, so its W-reach is bounded and small; RAFT-Stereo's
    correlation pyramid is ALL-PAIRS along W (its reach is the full
    image width — measured 54 px max error at margin=32 on a 256-wide
    pair), so it needs full-width eval or the banded
    ``correlation_volume_wsharded`` pipeline instead.  Inputs are replicated ([B,H,W,3] is small next
    to the activations this avoids materialising per chip); activation
    memory and compute per chip scale with (W/n + 2·margin) instead of W,
    which is what enables very wide (4K+) pairs that do not fit one chip.

    ``apply_fn(left_slice, right_slice) -> [B, H', width, 1]`` is the
    jittable eval forward (close over variables); ``out_width`` is the
    model's output W for a full-width input (e.g. W for a convex-8×
    model).  Returns ``run(left, right) -> [B, H', out_width, 1]``
    sharded on W.
    """
    n = mesh.shape[axis_name]

    def shard(l, r):
        W = l.shape[2]
        assert W % n == 0 and (W // n) % 8 == 0 and margin % 8 == 0, (
            "W, W/n and margin must be multiples of 8 for resize phase "
            "alignment"
        )
        Ws = W // n
        width = min(W, Ws + 2 * margin)
        # output columns per input column (1 for full-res-out models,
        # 1/8 for low-res heads) — kept exact via multiply-then-divide
        assert (Ws * out_width) % W == 0, (Ws, out_width, W)
        i = jax.lax.axis_index(axis_name)
        start = jnp.clip(i * Ws - margin, 0, W - width)
        ls = jax.lax.dynamic_slice_in_dim(l, start, width, axis=2)
        rs = jax.lax.dynamic_slice_in_dim(r, start, width, axis=2)
        disp = apply_fn(ls, rs)
        off = ((i * Ws - start) * out_width) // W
        return jax.lax.dynamic_slice_in_dim(
            disp, off, (Ws * out_width) // W, axis=2
        )

    fn = jax.jit(
        jax.shard_map(
            shard, mesh=mesh, in_specs=(P(), P()),
            out_specs=P(None, None, axis_name, None),
        )
    )
    return fn


def make_wsharded_value_and_grad(
    mesh: Mesh,
    loss_map_fn,
    margin: int,
    axis_name: str = "data",
):
    """W-sharded TRAINING by overlap-and-discard — loss and parameter
    gradients of the unmodified model with image W partitioned over the
    mesh (the training side of ``make_wsharded_model_eval``).

    Exactness argument: the global loss is a masked mean of per-pixel
    terms, and each kept pixel's forward value inside its slab equals
    the full-width forward wherever ``margin`` covers the receptive
    field + disparity reach, so its gradient contribution (which flows
    only through that slab's compute) is also exact; discarded margin
    columns contribute zero loss, hence no double counting, and the
    ``psum`` of per-shard parameter grads is the true global gradient.
    Parity-tested (value + grads) against the unsharded step on the
    8-device mesh.

    Norm caveat: train-mode BatchNorm computes batch statistics over the
    local slab (+margins), not the global width — the same per-device
    statistics approximation the reference's ``DataParallel`` makes per
    GPU (trainer_DLC_GRU.py:102-106).  Eval-mode BN and the group/
    instance norms are per-sample exact.

    ``loss_map_fn(params, left, right, gt) -> [B, H, w, 1]`` per-pixel
    loss map at output resolution (e.g. the weighted sequence-loss map).
    Returns ``vag(params, left, right, gt, valid) -> (loss, grads)``
    where ``loss`` is the valid-masked global mean and ``grads`` match
    ``jax.grad`` of the same unsharded masked mean; inputs are
    replicated (small next to activations — per-chip activation memory
    scales with W/n + 2·margin, which is what makes very wide pairs
    trainable at all).
    """
    n = mesh.shape[axis_name]

    def global_mean_loss(params, l, r, gt, valid):
        def shard(params, l, r, gt, valid):
            W = l.shape[2]
            assert W % n == 0 and (W // n) % 8 == 0 and margin % 8 == 0, (
                "W, W/n and margin must be multiples of 8 for resize "
                "phase alignment"
            )
            Ws = W // n
            width = min(W, Ws + 2 * margin)
            i = jax.lax.axis_index(axis_name)
            start = jnp.clip(i * Ws - margin, 0, W - width)
            sl = partial(jax.lax.dynamic_slice_in_dim, start_index=start,
                         slice_size=width, axis=2)
            lm = loss_map_fn(params, sl(l), sl(r), sl(gt))
            off = i * Ws - start
            keep = jax.lax.dynamic_slice_in_dim(lm, off, Ws, axis=2)
            v = jax.lax.dynamic_slice_in_dim(sl(valid), off, Ws, axis=2)
            s = jax.lax.psum(jnp.sum(keep * v), axis_name)
            c = jax.lax.psum(jnp.sum(v), axis_name)
            return s / jnp.maximum(c, 1.0)

        # check_vma=False: the custom-VJP conv (nn/conv.py) confuses the
        # varying-manual-axes *checker* when its backward runs inside a
        # scan under shard_map (zero-init grad carry is unvarying, the
        # per-slab contributions vary) — JAX's own error message names
        # this flag as the workaround; values/grads are parity-tested
        # against the unsharded step (test_wsharded_value_and_grad_parity).
        # TODO: the flag disables the checker for the WHOLE sharded step,
        # not just the conv — re-enable (or scope the escape hatch to the
        # custom-vjp site) once the upstream custom_vjp-in-scan checker
        # issue is fixed or JAX grows a narrower opt-out.
        return jax.shard_map(
            shard, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
            out_specs=P(), check_vma=False,
        )(params, l, r, gt, valid)

    return jax.jit(jax.value_and_grad(global_mean_loss))


def allpairs_corr1d_wsharded(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """W-sharded RAFT all-pairs 1D correlation via a ring exchange of
    right-feature stripes (the SURVEY §5 sketch made real; reference
    op models/IterativeLocalCostVolume/corr/corr.py:104-111).

    Call INSIDE shard_map with the W axis of both feature maps
    partitioned over ``axis_name``: per-shard inputs [B, H, Ws, C] →
    per-shard correlation [B, H, Ws, W_global] — the w1 (row) axis stays
    sharded, the w2 (column) axis is materialised in full, which is what
    the downstream pyramid/lookup need (RAFT's reach along w2 is the
    full image width, the reason overlap-and-discard cannot cover this
    family — see make_wsharded_model_eval note).

    Ring schedule: n−1 ``ppermute`` steps, each passing the current
    right stripe to the left neighbour so every device sees every stripe
    once; each step contracts the local left block against the visiting
    stripe on the MXU (one [Ws, C] × [C, Ws] matmul per (b, h)) and
    writes the [Ws, Ws] block at its global column offset.  Communication
    rides the ICI and overlaps with the contraction of the previous
    stripe under XLA's latency-hiding scheduler.  Values are
    bit-parity-tested against ``ops.allpairs_corr1d``; the op is
    differentiable (ppermute transposes to the reverse permutation).

    This op is the correlation stage of the WHOLE-MODEL W-sharded RAFT
    drivers, ``raft_wshard.make_wsharded_raft_eval`` /
    ``make_wsharded_raft_train``: encoders on
    clip-shifted slabs with margin-masked global norm statistics
    (``nn/raft/encoders.WShardCtx`` + ``GroupNormNHWC`` keep-masks /
    ``axis_name`` psum), this ring for the full-w2 rows, then the GRU
    cascade on halo windows with a per-iteration hidden-state
    ``ppermute`` re-exchange — parity-tested end-to-end
    (``test_wsharded_raft_whole_model_parity``).  Memory win is the
    point: the [B,H,W,W] pyramid — RAFT's dominant tensor — scales as
    W²/n per device.
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    B, H, Ws, C = fmap2.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    out = jnp.zeros(fmap1.shape[:3] + (n * Ws,), jnp.float32)
    stripe = fmap2
    src = i
    for k in range(n):
        blk = jnp.einsum(
            "bhwc,bhvc->bhwv", fmap1, stripe,
            preferred_element_type=jnp.float32,
        ) * scale                                        # [B, H, Ws1, Ws]
        out = jax.lax.dynamic_update_slice_in_dim(out, blk, src * Ws, axis=3)
        if k < n - 1:
            # receive the stripe of the right neighbour (src advances +1)
            stripe = jax.lax.ppermute(
                stripe, axis_name,
                perm=[((j + 1) % n, j) for j in range(n)],
            )
            src = (src + 1) % n
    return out


def make_wsharded_initial_disparity(
    mesh: Mesh,
    max_disp: int,
    axis_name: str = "data",
    radius: float = 2.0,
    num_samples: int = 20,
):
    """Jitted W-sharded pipeline: features → correlation volume →
    soft-argmin → fixed-radius local refinement (baseline.py:38 semantics).

    Features stay sharded on W end-to-end (spec ``P(None, None, axis)``);
    the returned disparities are sharded the same way.  Use when a single
    pair's W at full resolution exceeds one chip's HBM/compute budget —
    the stereo analogue of context parallelism.
    """

    def per_shard(fl, fr):
        vol = correlation_volume_wsharded(fl, fr, max_disp, axis_name)
        disp0 = soft_argmin(vol.astype(jnp.float32))[..., None]
        refined = fixed_local_cost_volume(
            vol.astype(jnp.float32), disp0, radius, num_samples,
            consider_valid=True,
        )
        return disp0, refined

    spec = P(None, None, axis_name, None)
    fn = jax.jit(
        jax.shard_map(
            per_shard, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec),
        )
    )

    def run(feat_l, feat_r):
        sharding = NamedSharding(mesh, spec)
        return fn(jax.device_put(feat_l, sharding),
                  jax.device_put(feat_r, sharding))

    return run
