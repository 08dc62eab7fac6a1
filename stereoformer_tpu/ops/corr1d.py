"""All-pairs 1D (epipolar) correlation pyramid + windowed lookup, for the
RAFT-Stereo family.

Reference semantics: ``models/IterativeLocalCostVolume/corr/corr.py:54-111``
— per row, corr[b,h,w1,w2] = <F1[b,h,w1], F2[b,h,w2]> / sqrt(C); a 4-level
pyramid averages along w2; lookup bilinearly samples a ±r window around the
current match position at each level.

TPU design: the W×W similarity matrix is one MXU matmul per (b, h).  The
pyramid is an average-pool over the last axis; lookups are clamped gathers
+ lerp on the innermost (lane) axis.

If W is ever sharded across a mesh axis, the matmul becomes an
``all_gather`` of right-feature stripes over ICI followed by local matmuls
(ring schedule) — see parallel/; not needed at reference resolutions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def allpairs_corr1d(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """fmap1/fmap2: [B, H, W, C] -> corr [B, H, W, W2] (scaled by 1/√C),
    corr.py:104-111."""
    C = fmap1.shape[-1]
    corr = jnp.einsum(
        "bhwc,bhvc->bhwv", fmap1, fmap2, preferred_element_type=jnp.float32
    )
    return corr / jnp.sqrt(jnp.asarray(C, jnp.float32))


def corr_pyramid(corr: jnp.ndarray, num_levels: int) -> list[jnp.ndarray]:
    """Average-pool the last (w2) axis by 2 per level (corr.py:70-76).
    Returns [corr_0, ..., corr_{L-1}]."""
    out = [corr]
    x = corr
    for _ in range(num_levels - 1):
        W2 = x.shape[-1]
        x = x[..., : (W2 // 2) * 2]
        x = x.reshape(*x.shape[:-1], W2 // 2, 2).mean(axis=-1)
        out.append(x)
    return out


def _sample_last_gather(x: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of the last axis of x [..., W] at coords [..., S]
    with zero padding outside [0, W-1] (grid_sample 'zeros' as used by
    bilinear_sampler, utils/utils.py:64-73)."""
    W = x.shape[-1]
    x0 = jnp.floor(coords).astype(jnp.int32)
    x1 = x0 + 1
    t = coords - x0.astype(coords.dtype)
    w0 = ((x0 >= 0) & (x0 <= W - 1)).astype(coords.dtype)
    w1 = ((x1 >= 0) & (x1 <= W - 1)).astype(coords.dtype)
    v0 = jnp.take_along_axis(x, jnp.clip(x0, 0, W - 1), axis=-1)
    v1 = jnp.take_along_axis(x, jnp.clip(x1, 0, W - 1), axis=-1)
    return v0 * (1 - t) * w0 + v1 * t * w1


def _window_sample_onehot(
    corr: jnp.ndarray, coords: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Gather-free ±radius windowed bilinear lookup.

    corr [..., W2], coords [...] (the window centre) ->
    [..., 2r+1] with lookup[s] = bilerp(corr, coords + s − r), zero
    outside [0, W2−1].

    Per-pixel ``take_along_axis`` serializes on TPU (measured 80× model
    slowdown in RAFT); but the 2r+2 needed samples are CONTIGUOUS around
    floor(coords), so one boolean one-hot of the base index contracted
    against shifted copies of the row replaces every gather with
    vectorised multiply-reduce (the base one-hot is zero out-of-range,
    which reproduces the zero-padding mask exactly).
    """
    W2 = corr.shape[-1]
    i0 = jnp.floor(coords)
    frac = (coords - i0)[..., None]                      # [..., 1]
    # the one-hot must represent base indices up to radius+1 OUTSIDE the
    # row (their taps can still land inside), so it lives on a padded
    # coordinate system: v' = v + P, P = r+1
    P = radius + 1
    Q = 2 * P                                            # extra room for tap shifts
    v = jnp.arange(W2 + 2 * P) - P                       # real coords of v'
    onehot = (i0[..., None] == v).astype(corr.dtype)     # [..., W2+2P]
    big = jnp.pad(corr, [(0, 0)] * (corr.ndim - 1) + [(P + Q, P + Q)])
    taps = []
    for k in range(-radius, radius + 2):
        # slice aligned so big_slice[v'] = corr[v' − P + k] (zeros outside)
        shifted = big[..., Q + k : Q + k + W2 + 2 * P]
        taps.append(jnp.sum(onehot * shifted, axis=-1))
    taps = jnp.stack(taps, axis=-1)                      # [..., 2r+2]
    lo = taps[..., :-1]                                  # value at i0+s−r
    hi = taps[..., 1:]                                   # value at i0+s−r+1
    return lo * (1.0 - frac) + hi * frac


def _auto_block(radius: int) -> int:
    """Block size such that the slab (block + 2r+1 lanes) fills exactly
    one 128-lane register row — a 73-lane slab pads to 128 and wastes
    43% of every slab read/write."""
    assert 2 * radius + 1 < 128, radius
    return 128 - (2 * radius + 1)


def corr_block_cache(
    pyramid: Sequence[jnp.ndarray], radius: int, block: int | None = None
) -> list[jnp.ndarray]:
    """Iteration-invariant blocked-overlap views of the pyramid for the
    two-stage windowed lookup (see ``_window_sample_blocked``).

    Per level: ``Bl[..., q, j] = pad(corr)[..., block*q + j]`` for
    ``j < block + 2r + 1`` — every length-(2r+2) tap window whose padded
    start index ``sb`` lies in block ``q = sb // block`` is contained in
    slab ``Bl[..., q, :]``.  Built ONCE per forward (outside the GRU
    iteration loop): the per-iteration lookup then reads ~2× the pyramid
    instead of the one-hot path's (2r+2)× re-read of it, which made the
    lookup the loop-fusion HBM dominator of RAFT eval (12 × 11.3 ms at
    B=8 @ 576×960, round-5 trace).
    """
    if block is None:
        block = _auto_block(radius)
    assert 2 * radius + 1 <= block, (radius, block)
    out = []
    for corr in pyramid:
        W2 = corr.shape[-1]
        T = 2 * radius + 2
        slabw = block + 2 * radius + 1
        # padded-buffer coords: v' = v + T; valid sb ∈ [1, W2+T−1]
        nq = (W2 + T - 1) // block + 1
        # stack of CONTIGUOUS lane slices: a strided lane-slice build
        # measured 26 ms/step at B=8 and a reshape-based one 14 ms/step
        # (both are lane shuffles); contiguous slices + a new-axis stack
        # are plain copies
        big = jnp.pad(
            corr,
            [(0, 0)] * (corr.ndim - 1) + [(T, nq * block + slabw - W2 - T)],
        )
        out.append(jnp.stack(
            [big[..., q * block: q * block + slabw] for q in range(nq)],
            axis=-2,
        ))  # [..., nq, slabw]
    return out


def _window_sample_blocked(
    bl: jnp.ndarray, W2: int, coords: jnp.ndarray, radius: int,
    block: int | None = None,
) -> jnp.ndarray:
    """Two-stage ±radius windowed bilinear lookup, bit-equal to
    ``_window_sample_onehot`` (pure selection — no arithmetic differs).

    Stage A selects the one slab (width block+2r+1) containing the tap
    window via a one-hot over ``nq`` block indices — each element of the
    blocked view is read ONCE per iteration, vs the flat one-hot's one
    full-row read per tap.  Stage B extracts the 2r+2 taps from the slab
    with a one-hot over the ``block`` intra-slab offsets.  An
    ``optimization_barrier`` pins the slab so XLA cannot re-fuse stage A
    into each tap of stage B (which would recompute the big contraction
    2r+2 times and undo the traffic win).
    """
    if block is None:
        block = _auto_block(radius)
    T = 2 * radius + 2
    nq = bl.shape[-2]
    i0 = jnp.floor(coords)
    frac = (coords - i0)[..., None]
    # validity in FLOAT domain: the window [i0−r, i0+r+1] overlaps
    # [0, W2) iff its start ∈ [−(T−1), W2−1]; NaN/±inf coords compare
    # false → zeros, matching the flat one-hot path (whose float
    # equality-compare never fires for them).  The int cast below is
    # only reached through the clip, so a garbage cast result is
    # harmless once ``valid`` is false.
    valid = (i0 - radius >= -(T - 1)) & (i0 - radius <= W2 - 1)
    start = jnp.clip(i0 - radius, -(T - 1), W2 - 1).astype(jnp.int32)
    sb = start + T                            # padded-buffer start ∈ [1, W2+T−1]
    qb = sb // block
    off = sb - qb * block                     # ∈ [0, block)
    dt = bl.dtype
    oh_q = (qb[..., None] == jnp.arange(nq)).astype(dt)          # [..., nq]
    slab = jnp.einsum("...n,...nj->...j", oh_q, bl)              # [..., slabw]
    slab = slab * valid[..., None].astype(dt)
    slab = jax.lax.optimization_barrier(slab)
    oh_o = (off[..., None] == jnp.arange(block)).astype(dt)      # [..., block]
    taps = [
        jnp.sum(oh_o * jax.lax.slice_in_dim(slab, k, k + block, axis=-1),
                axis=-1)
        for k in range(T)
    ]
    taps = jnp.stack(taps, axis=-1)                              # [..., T]
    lo = taps[..., :-1]
    hi = taps[..., 1:]
    return lo * (1.0 - frac) + hi * frac


def _sample_last(
    x: jnp.ndarray, coords: jnp.ndarray, radius: int | None = None
) -> jnp.ndarray:
    """Windowed sampler used by corr_lookup: coords must be
    ``centre + arange(-r, r+1)``; when ``radius`` is given the gather-free
    one-hot path is used (identical values, TPU-fast)."""
    if radius is not None:
        centre = coords[..., radius]
        return _window_sample_onehot(x, centre, radius)
    return _sample_last_gather(x, coords)


def corr_lookup(
    pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray, radius: int,
    cache: Sequence[jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Sample a ±radius window around ``coords`` at every pyramid level
    (corr.py:78-101).

    coords: [B, H, W] current x-position of the match on the epipolar line
    (full-resolution units of level 0).  Returns
    [B, H, W, L*(2r+1)] feature (innermost ordering: level-major).

    ``cache``: optional ``corr_block_cache(pyramid, radius)`` — when the
    lookup runs repeatedly over a fixed pyramid (the GRU iteration loop),
    the blocked two-stage sampler cuts per-iteration HBM traffic ~(r+1)×
    with bit-identical values.
    """
    offsets = jnp.arange(-radius, radius + 1, dtype=coords.dtype)
    outs = []
    for lvl, corr in enumerate(pyramid):
        centre = coords / (2**lvl)
        if cache is not None:
            outs.append(_window_sample_blocked(
                cache[lvl], corr.shape[-1], centre, radius))
        else:
            c = centre[..., None] + offsets             # [B,H,W,2r+1]
            outs.append(_sample_last(corr, c, radius=radius))
    return jnp.concatenate(outs, axis=-1)
