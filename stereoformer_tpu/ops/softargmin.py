"""Soft-argmin disparity regression and probability statistics.

Reference semantics: ``models/utils/estimation.py:7-62`` (softmax over the
disparity axis, expectation over candidates 0..D-1) and the variance helper
``models/LocalCostVolume/Attempts/variance_local_cost_volume.py:12-25``.

Volumes are [B, H, W, D] (D innermost — the softmax is a lane reduction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmin(cost_volume: jnp.ndarray, match_similarity: bool = True) -> jnp.ndarray:
    """Disparity expectation under softmax(cost).

    cost_volume: [B, H, W, D] -> disp [B, H, W].
    If ``match_similarity`` is False the volume holds matching *costs* and is
    negated first (estimation.py:17).
    """
    if not match_similarity:
        cost_volume = -cost_volume
    prob = jax.nn.softmax(cost_volume, axis=-1)
    d = jnp.arange(cost_volume.shape[-1], dtype=prob.dtype)
    return jnp.sum(prob * d, axis=-1)


def soft_argmin_with_prob(
    cost_volume: jnp.ndarray, match_similarity: bool = True
):
    """Soft-argmin that also returns the probability volume
    (estimation.py:37-62)."""
    if not match_similarity:
        cost_volume = -cost_volume
    prob = jax.nn.softmax(cost_volume, axis=-1)
    d = jnp.arange(cost_volume.shape[-1], dtype=prob.dtype)
    disp = jnp.sum(prob * d, axis=-1)
    return disp, prob


def disparity_variance(prob_volume: jnp.ndarray, cur_disp: jnp.ndarray) -> jnp.ndarray:
    """sqrt( Σ_d p_d (d - μ)^2 ) around the current disparity μ.

    prob_volume: [B, H, W, D]; cur_disp: [B, H, W] or [B, H, W, 1].
    Returns [B, H, W, 1] root variance
    (variance_local_cost_volume.py:12-25).
    """
    if cur_disp.ndim == prob_volume.ndim:
        cur = cur_disp
    else:
        cur = cur_disp[..., None]
    d = jnp.arange(prob_volume.shape[-1], dtype=prob_volume.dtype)
    err = (d - cur) ** 2
    var = jnp.sum(prob_volume * err, axis=-1, keepdims=True)
    return jnp.sqrt(var)


def uncertainty_volume(
    prob_volume: jnp.ndarray, cur_disp: jnp.ndarray
) -> jnp.ndarray:
    """p_d · d · (d - μ)² per disparity bin — the GRU guidance input
    (Attempts/update.py:86).  prob [B,H,W,D], cur_disp [B,H,W,1] -> [B,H,W,D].
    """
    d = jnp.arange(prob_volume.shape[-1], dtype=prob_volume.dtype)
    return prob_volume * d * (d - cur_disp) ** 2
