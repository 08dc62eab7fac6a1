"""Disparity upsampling: learned 8× convex combination and simple bilinear.

Reference semantics: ``models/utils/upsample.py:22-43``.  The convex
upsampler takes a mask of 9·64 logits per coarse pixel, softmaxes over the
9 spatial neighbours, and blends the 3×3 neighbourhood of ``8·disp`` into
each of the 8×8 fine sub-pixels.

TPU design: instead of im2col/unfold, the 9 neighbours are materialised as
shifted copies (an XLA fusion of pads+slices) and contracted with the mask
in one einsum — everything stays NHWC with the 9·64 mask channels in lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .resize import resize_bilinear


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x[..., h+dy, w+dx, :] with zero padding (NHWC)."""
    B, H, W, C = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.dynamic_slice(pad, (0, 1 + dy, 1 + dx, 0), (B, H, W, C))


def neighborhood9(x: jnp.ndarray) -> jnp.ndarray:
    """Stack the 3×3 zero-padded neighbourhood: [B,H,W,C] -> [B,H,W,9,C]
    with k = ky*3+kx ordering matching F.unfold (upsample.py:29-32)."""
    outs = [
        _shift2d(x, dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ]
    return jnp.stack(outs, axis=3)


def _convex_probs(mask: jnp.ndarray, ff: int):
    """Softmax over the 9 neighbours without the [B,H,W,9,f,f] view: the
    9 logits for a sub-pixel live at lanes k·f²+yx, so the k-reduction
    is 9 lane-offset slices combined elementwise — one fused XLA kernel
    over the flat mask, no 6-D layout copies (the 6-D form cost ~1 ms of
    pure ``copy`` ops per flagship eval step at [8,72,120,576])."""
    m = mask.astype(jnp.float32)
    logits = [m[..., k * ff : (k + 1) * ff] for k in range(9)]
    mx = logits[0]
    for s in logits[1:]:
        mx = jnp.maximum(mx, s)
    exps = [jnp.exp(s - mx) for s in logits]
    den = sum(exps)
    return [e / den for e in exps]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def upsample_convex(
    disp: jnp.ndarray, mask: jnp.ndarray, factor: int
) -> jnp.ndarray:
    """Learned convex ``factor``× upsample.

    disp: [B, H, W, 1] coarse disparity (in coarse-pixel units —
    multiplied by ``factor`` internally, upsample.py:29).
    mask: [B, H, W, 9·factor²] logits laid out (k, dy, dx) per coarse
    pixel, matching the reference's ``view(N,1,9,f,f,H,W)``
    (upsample.py:25; RAFT's factor-4 variant raft_stereo.py:110-122).
    Returns [B, fH, fW, 1].

    custom VJP: autodiff of the lane-sliced softmax would transpose the
    9 slices into materialised pads (measured +12% on the LowCNN train
    step); the hand-written backward keeps both directions lane-sliced
    elementwise (gradient parity tests in tests/test_upsample_warp.py).
    """
    B, H, W, _ = disp.shape
    f = factor
    ff = f * f
    probs = _convex_probs(mask, ff)
    nbr = neighborhood9(float(f) * disp)[..., 0]       # [B,H,W,9] f32
    up = sum(
        p * nbr[..., k : k + 1] for k, p in enumerate(probs)
    )                                                  # [B,H,W,f*f]
    # depth-to-space on the 9×-smaller blended tensor
    up = up.reshape(B, H, W, f, f)
    up = jnp.transpose(up, (0, 1, 3, 2, 4))            # [B,H,f,W,f]
    return up.reshape(B, f * H, f * W, 1)


def _upsample_convex_fwd(disp, mask, factor):
    return upsample_convex(disp, mask, factor), (disp, mask)


def _upsample_convex_bwd(factor, res, g):
    disp, mask = res
    B, H, W, _ = disp.shape
    f = factor
    ff = f * f
    # space-to-depth the cotangent back to [B,H,W,f*f]
    gb = g.reshape(B, H, f, W, f).transpose(0, 1, 3, 2, 4)
    gb = gb.reshape(B, H, W, ff).astype(jnp.float32)
    probs = _convex_probs(mask, ff)
    nbr = neighborhood9(float(f) * disp)[..., 0]       # [B,H,W,9]
    # up·g, shared by every softmax-transpose term
    upg = sum(p * nbr[..., k : k + 1] for k, p in enumerate(probs)) * gb
    # d mask_k = p_k · g · (nbr_k − up)   (softmax VJP, lane-sliced)
    dmask = jnp.concatenate(
        [p * (nbr[..., k : k + 1] * gb - upg) for k, p in enumerate(probs)],
        axis=-1,
    ).astype(mask.dtype)
    # d nbr_k = Σ_yx p_k·g; transpose of neighborhood9 = opposite shifts
    ddisp = sum(
        _shift2d(
            jnp.sum(p * gb, axis=-1, keepdims=True), -dy, -dx
        )
        for p, (dy, dx) in zip(
            probs, [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        )
    )
    return (float(f) * ddisp).astype(disp.dtype), dmask


upsample_convex.defvjp(_upsample_convex_fwd, _upsample_convex_bwd)


def upsample_convex8(disp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Learned convex 8× upsample (upsample.py:22-38)."""
    return upsample_convex(disp, mask, 8)


def upsample_simple8(disp: jnp.ndarray) -> jnp.ndarray:
    """8× bilinear upsample with align_corners=True and ×8 value scaling
    (upsample.py:41-43).  disp: [B, H, W, 1] -> [B, 8H, 8W, 1]."""
    B, H, W, _ = disp.shape
    return 8.0 * resize_bilinear(disp, (8 * H, 8 * W), align_corners=True)
