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
    """
    B, H, W, _ = disp.shape
    f = factor
    ff = f * f
    # Softmax over the 9 neighbours without the [B,H,W,9,f,f] view: the
    # 9 logits for a sub-pixel live at lanes k·f²+yx, so the k-reduction
    # is 9 lane-offset slices combined elementwise — one fused XLA
    # kernel over the flat mask, no 6-D layout copies (the 6-D form cost
    # ~1 ms of pure `copy` ops per flagship eval step at [8,72,120,576]).
    m = mask.astype(jnp.float32)
    logits = [m[..., k * ff : (k + 1) * ff] for k in range(9)]
    mx = logits[0]
    for s in logits[1:]:
        mx = jnp.maximum(mx, s)
    exps = [jnp.exp(s - mx) for s in logits]
    den = sum(exps)
    nbr = neighborhood9(float(f) * disp)[..., 0]       # [B,H,W,9] f32
    up = sum(
        e * nbr[..., k : k + 1] for k, e in enumerate(exps)
    ) / den                                            # [B,H,W,f*f]
    # depth-to-space on the 9×-smaller blended tensor
    up = up.reshape(B, H, W, f, f)
    up = jnp.transpose(up, (0, 1, 3, 2, 4))            # [B,H,f,W,f]
    return up.reshape(B, f * H, f * W, 1)


def upsample_convex8(disp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Learned convex 8× upsample (upsample.py:22-38)."""
    return upsample_convex(disp, mask, 8)


def upsample_simple8(disp: jnp.ndarray) -> jnp.ndarray:
    """8× bilinear upsample with align_corners=True and ×8 value scaling
    (upsample.py:41-43).  disp: [B, H, W, 1] -> [B, 8H, 8W, 1]."""
    B, H, W, _ = disp.shape
    return 8.0 * resize_bilinear(disp, (8 * H, 8 * W), align_corners=True)
