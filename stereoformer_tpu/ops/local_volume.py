"""Local cost-volume resampling — the algorithmic heart of the framework.

A full-range volume [B, H, W, D] is re-sampled at S+1 *continuous* disparity
candidates per pixel (gather-floor / gather-ceil + linear blend), and a
soft-argmin over the resampled costs gives the refined disparity.

Reference semantics: ``models/LocalCostVolume/Attempts/update.py:326-345``
(``build_cost_volume_from_volume``) plus the candidate generation shared by
the fixed / variance / learned / GRU variants
(``fixed_local_cost_volume.py:13-58``, ``variance_local_cost_volume.py:28-78``,
``update.py:280-310``).

Gradient note: the reference wraps indices in STE ceil/floor
(``update.py:10-14``) but then casts through ``.long()`` which severs that
path; the surviving gradient w.r.t. the candidates is exactly the standard
linear-interpolation gradient (v_ceil − v_floor), and the gradient w.r.t.
the volume is the scatter-add of the two blend weights.  Plain
``jnp.take_along_axis`` + ``stop_gradient`` on the integer indices
reproduces both exactly, so no custom VJP is required for parity (one is
still used by the Pallas kernel for speed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def resample_volume_gather(
    volume: jnp.ndarray, candidates: jnp.ndarray
) -> jnp.ndarray:
    """Gather-based reference implementation.

    out = v[floor]·(clip(ceil(s)) − s) + v[ceil]·(1 − clip(ceil(s)) + s)
    with both indices clipped to [0, D−1] — bit-matching
    ``build_cost_volume_from_volume`` (update.py:326-345) including its
    boundary behaviour (clamped indices, rates computed from the *clamped*
    ceil index).
    """
    D = volume.shape[-1]
    ceil_f = jnp.clip(jnp.ceil(candidates), 0, D - 1)
    floor_i = jnp.clip(jnp.floor(candidates), 0, D - 1).astype(jnp.int32)
    ceil_i = ceil_f.astype(jnp.int32)
    # rate from the clamped ceil index; grad flows only through -candidates
    floor_rate = jax.lax.stop_gradient(ceil_f) - candidates
    ceil_rate = 1.0 - floor_rate
    v_floor = jnp.take_along_axis(volume, floor_i, axis=-1)
    v_ceil = jnp.take_along_axis(volume, ceil_i, axis=-1)
    return v_floor * floor_rate + v_ceil * ceil_rate


def resample_volume_hat(
    volume: jnp.ndarray, candidates: jnp.ndarray
) -> jnp.ndarray:
    """Hat-function (gather-free) formulation — the TPU-preferred path.

    The clamped gather-lerp is algebraically

        out_s = Σ_d v_d · max(0, 1 − |clip(c_s, 0, D−1) − d|)

    (the clip reproduces the reference's boundary behaviour for every
    out-of-range case, including the surviving −1/+1 gradient structure:
    d out/d c = v_ceil − v_floor inside [0, D−1], 0 outside).  This turns
    both the forward and the backward into dense elementwise + reduction
    work — no gathers forward, no scatter-adds backward — which is the
    shape the TPU VPU/MXU wants.
    """
    D = volume.shape[-1]
    c = jnp.clip(candidates, 0, D - 1)                 # [B,H,W,S]
    d = jnp.arange(D, dtype=volume.dtype)              # [D]
    delta = c[..., None] - d                           # [B,H,W,S,D]
    # subgradient choices matter at integer candidates: jnp.abs'(0)=1 and
    # jnp.maximum ties split 0.5/0.5, but max(Δ,−Δ) ties cancel to 0 and
    # jax.nn.relu'(0)=0 — together they reproduce the reference's exact
    # zero gradient at integer candidates (v_ceil − v_floor with equal
    # indices).
    w = jax.nn.relu(1.0 - jnp.maximum(delta, -delta))
    return jnp.einsum("bhwsd,bhwd->bhws", w, volume)


def resample_volume(
    volume: jnp.ndarray, candidates: jnp.ndarray, method: str = "hat"
) -> jnp.ndarray:
    """Linearly interpolate ``volume`` [B,H,W,D] at continuous disparity
    ``candidates`` [B,H,W,S] -> [B,H,W,S].

    Reference semantics: ``build_cost_volume_from_volume``
    (update.py:326-345).  ``method``: "hat" (dense, TPU-fast) or "gather"
    (the literal translation); both are exactly equivalent in value and
    gradient (tested against the torch reference).
    """
    if method == "hat":
        return resample_volume_hat(volume, candidates)
    return resample_volume_gather(volume, candidates)


def make_candidates(
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    cur_disp: jnp.ndarray,
    num_samples: int,
    max_disp: int,
    consider_valid: bool = True,
    extra_invalid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """S+1 uniform candidates in [lower, upper] with the reference's
    invalid-pixel fallback.

    lower/upper/cur_disp: [B, H, W, 1]. Returns [B, H, W, S+1].

    ``consider_valid=True`` (the trained configuration): pixels whose range
    leaves [0, D−1) collapse *all* candidates back to ``cur_disp``
    (update.py:285-304). ``extra_invalid`` ORs in additional invalidity
    (the variance variant's image-border test,
    variance_local_cost_volume.py:46-52).
    ``consider_valid=False``: bounds are clamped instead
    (fixed_local_cost_volume.py:28-30 semantics: lower→max(0,·),
    upper→clip(·,0,D)).
    """
    steps = jnp.arange(num_samples + 1, dtype=lower.dtype)  # [S+1]
    if consider_valid:
        invalid = (lower < 0).astype(lower.dtype) + (
            upper >= max_disp - 1
        ).astype(lower.dtype)
        if extra_invalid is not None:
            invalid = invalid + extra_invalid.astype(lower.dtype)
        invalid = jnp.clip(invalid, max=1.0)
        interval = (upper - lower) / num_samples
        cands = lower + steps * interval                 # [B,H,W,S+1]
        return cands * (1.0 - invalid) + invalid * cur_disp
    else:
        lower = jnp.clip(lower, min=0)
        upper = jnp.clip(upper, min=0, max=max_disp)
        interval = (upper - lower) / num_samples
        return lower + steps * interval


def local_soft_argmin(
    volume: jnp.ndarray, candidates: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Resample + softmax + expectation over the candidates
    (update.py:307-313).  Returns disp [B, H, W, 1].

    ``impl``: "pallas" forces the fused Pallas kernel pair (forward AND
    hand-written backward, ops/pallas/local_refine.py).  Measured v5e:
    9× the XLA path isolated, but inside the jitted model XLA fuses the
    forward with its producers/consumers and wins at eval AND in the
    train step (BENCHMARKS.md "local-refine backward" — in-model the
    kernel pair was a net loss), so "auto" means XLA everywhere and no
    model caller passes ``impl``; the Pallas pair stays env-opt-in via
    ``STEREOFORMER_LOCAL_REFINE=pallas|xla`` (trace-time, TPU only) for
    A/B measurement.  Values and gradients are identical (parity-tested,
    incl. subgradient tie choices).
    """
    if impl == "auto":
        import os

        env = os.environ.get("STEREOFORMER_LOCAL_REFINE", "")
        if env == "pallas" and jax.default_backend() == "tpu":
            impl = "pallas"
    if impl == "pallas":
        from .pallas.local_refine import fused_local_soft_argmin

        return fused_local_soft_argmin(volume, candidates, False)
    local = resample_volume(volume, candidates)
    score = jax.nn.softmax(local, axis=-1)
    return jnp.sum(score * candidates, axis=-1, keepdims=True)


def fixed_local_cost_volume(
    volume: jnp.ndarray,
    cur_disp: jnp.ndarray,
    radius: float,
    num_samples: int,
    consider_valid: bool = False,
) -> jnp.ndarray:
    """Fixed-radius local refinement (fixed_local_cost_volume.py:13-58).

    volume [B,H,W,D], cur_disp [B,H,W,1] -> refined disp [B,H,W,1].
    """
    D = volume.shape[-1]
    cands = make_candidates(
        cur_disp - radius,
        cur_disp + radius,
        cur_disp,
        num_samples,
        D,
        consider_valid=consider_valid,
    )
    return local_soft_argmin(volume, cands)


def variance_local_cost_volume(
    volume: jnp.ndarray,
    cur_disp: jnp.ndarray,
    gamma: float,
    num_samples: int,
    consider_valid: bool = False,
) -> jnp.ndarray:
    """Variance-scaled local refinement
    (variance_local_cost_volume.py:28-78): range = μ ± γ·σ where σ is the
    softmax-probability root variance; with ``consider_valid`` the
    image-border test upper>x also invalidates.
    """
    from .softargmin import disparity_variance

    B, H, W, D = volume.shape
    prob = jax.nn.softmax(volume, axis=-1)
    sigma = disparity_variance(prob, cur_disp)
    lower = cur_disp - gamma * sigma
    upper = cur_disp + gamma * sigma
    if consider_valid:
        x = jnp.arange(W, dtype=volume.dtype)[None, None, :, None]
        extra = (upper > x).astype(volume.dtype)
        cands = make_candidates(
            lower, upper, cur_disp, num_samples, D,
            consider_valid=True, extra_invalid=extra,
        )
    else:
        # reference clamps both bounds to [0, D-1] in this branch
        lower = jnp.clip(lower, 0, D - 1)
        upper = jnp.clip(upper, 0, D - 1)
        steps = jnp.arange(num_samples + 1, dtype=lower.dtype)
        cands = lower + steps * ((upper - lower) / num_samples)
    return local_soft_argmin(volume, cands)
