"""Epipolar cross-attention ops.

The reference *declares* a cross-attention cost volume
(``models/CrossAttentionCostVolume/cross_attention_cost_volume.py`` is an
empty file; only the group-wise correlation helper exists,
``GWC_Cost_Volume.py:5-24``) — this module supplies the capability the
repo name promises, designed TPU-first:

For rectified stereo the matching geometry is 1-D: left pixel (h, w) can
only match right pixels (h, w−d), d ∈ [0, D).  Cross-attention over that
band is therefore exactly a *banded* attention: scores are the group-wise
correlation band (one MXU matmul per row, band-extracted), the attended
right feature is a D-term shifted blend — no [W, W] attention matrix and
no giant [B, H, D, W, C] intermediate is ever materialised.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cost_volume import gwc_volume


def banded_attention_scores(
    q: jnp.ndarray, k: jnp.ndarray, max_disp: int, num_heads: int
) -> jnp.ndarray:
    """Multi-head epipolar attention scores.

    q (left) / k (right): [B, H, W, C] with C % num_heads == 0.
    Returns [B, H, W, D, heads]: per-head scaled dot products
    <q_head[w], k_head[w−d]> (0 where w < d) — i.e. the GWC volume
    (GWC_Cost_Volume.py:14-24) rescaled per attention convention
    (mean over head-dim · √dh ≡ dot / √dh).
    """
    dh = q.shape[-1] // num_heads
    # gwc_volume computes mean over the head dim; attention wants /sqrt(dh)
    return gwc_volume(q, k, max_disp, num_heads) * (dh / jnp.sqrt(dh))


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    max_disp: int,
    num_heads: int,
):
    """Banded cross-attention: returns (scores [B,H,W,D,heads],
    attended value [B,H,W,Cv]).

    attended[w] = Σ_d softmax_d(scores)[w, d] · v[w−d], computed as D
    static shifted multiply-adds (XLA fuses the loop; nothing bigger than
    [B, H, W, C] is live).  Out-of-band (w < d) positions are masked to
    −inf before the softmax.
    """
    B, H, W, Cv = v.shape
    scores = banded_attention_scores(q, k, max_disp, num_heads)
    w_idx = jnp.arange(W)[None, None, :, None, None]
    d_idx = jnp.arange(max_disp)[None, None, None, :, None]
    valid = w_idx >= d_idx                                   # [1,1,W,D,1]
    masked = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(masked, axis=3)                   # over D
    probs = jnp.where(valid, probs, 0.0)
    # head-averaged blend weights for the value aggregation
    pbar = probs.mean(axis=-1)                               # [B,H,W,D]
    attended = jnp.zeros_like(v)
    for d in range(max_disp):
        if d == 0:
            v_shift = v
        else:
            v_shift = jnp.pad(v, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :W, :]
        attended = attended + pbar[..., d : d + 1] * v_shift
    return scores, attended
