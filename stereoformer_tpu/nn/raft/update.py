"""RAFT-Stereo multi-scale GRU update cascade (NHWC Flax).

Capability map (models/IterativeLocalCostVolume/update/update.py):
- ``FlowHead``            — :6-14
- ``ContextConvGRU``      — :16-33 (gates biased by the per-scale context
  cz/cr/cq triplet)
- ``BasicMotionEncoder``  — :66-91 (corr+flow → 128ch incl. the raw flow)
- ``MultiUpdateBlock``    — :130-178: gru_coarse → gru_mid → gru_fine with
  avg-pool / align-corners-bilinear cross-scale links, flow head and the
  0.25-scaled convex-upsample mask head.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn
from ..conv import Conv

from ...ops import resize_bilinear
from .encoders import he_out


def pool2x(x):
    """3×3 stride-2 average pool, count_include_pad=True padding 1
    (update.py:120-121)."""
    return nn.avg_pool(
        x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
        count_include_pad=True,
    )


def interp_to(x, ref):
    """Bilinear align_corners=True resize to ref's spatial size
    (update.py:126-128)."""
    return resize_bilinear(x, ref.shape[1:3], align_corners=True)


class FlowHead(nn.Module):
    hidden: int = 256
    out: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden, (3, 3), padding=1, kernel_init=he_out(),
                            dtype=self.dtype)(x))
        # the head output feeds coordinate updates: keep it f32
        return Conv(self.out, (3, 3), padding=1, kernel_init=he_out(),
                       dtype=jnp.float32)(x)


class ContextConvGRU(nn.Module):
    """ConvGRU whose z/r/q gates each get a context bias map
    (update.py:16-33).  The z/r gate convs over the shared ``[h, x]``
    input are fused into one 2·hidden conv (bit-identical math; per-gate
    he_out init preserved via ``stacked_init`` — see nn/gru.py)."""

    hidden_dim: int
    kernel_size: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, h, context, *inputs):
        from ..gru import stacked_init

        cz, cr, cq = context
        x = jnp.concatenate([i.astype(h.dtype) for i in inputs], axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        k = self.kernel_size
        zr = Conv(
            2 * self.hidden_dim, (k, k), padding=k // 2, dtype=self.dtype,
            kernel_init=stacked_init(he_out(), 2), name="convzr",
        )(hx)
        z = nn.sigmoid(zr[..., : self.hidden_dim] + cz)
        r = nn.sigmoid(zr[..., self.hidden_dim :] + cr)
        q = nn.tanh(
            Conv(self.hidden_dim, (k, k), padding=k // 2, dtype=self.dtype,
                    kernel_init=he_out(), name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
            + cq
        )
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        c = nn.relu(Conv(64, (1, 1), kernel_init=he_out(), dtype=dt)(corr))
        c = nn.relu(Conv(64, (3, 3), padding=1, kernel_init=he_out(), dtype=dt)(c))
        f = nn.relu(Conv(64, (7, 7), padding=3, kernel_init=he_out(), dtype=dt)(flow))
        f = nn.relu(Conv(64, (3, 3), padding=1, kernel_init=he_out(), dtype=dt)(f))
        out = nn.relu(
            Conv(128 - 2, (3, 3), padding=1, kernel_init=he_out(), dtype=dt)(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class MultiUpdateBlock(nn.Module):
    """The 3-level GRU cascade.  ``net``/``inp`` are finest-first lists
    (net[0] at 1/4 for downsample=2)."""

    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 4
    corr_radius: int = 4
    n_gru_layers: int = 3
    n_downsample: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, net, inp, corr=None, flow=None,
                 iter08=True, iter16=True, iter32=True, update=True,
                 need_mask=True, interp_fn=None):
        # interp_fn: optional override of the cross-scale align-corners
        # upsample.  Under W-sharded eval (parallel/raft_wshard.py) the
        # block runs on halo-extended W-windows, where align_corners'
        # corner-to-corner mapping must be computed in GLOBAL column
        # coordinates — the sharded driver passes a closure that does so;
        # default is the reference mapping (update.py:126-128).
        if interp_fn is None:
            interp_fn = interp_to
        net = list(net)
        hd = self.hidden_dims
        if iter32 and self.n_gru_layers == 3:
            net[2] = ContextConvGRU(hd[0], dtype=self.dtype, name="gru32")(
                net[2], inp[2], pool2x(net[1])
            )
        if iter16 and self.n_gru_layers >= 2:
            if self.n_gru_layers > 2:
                net[1] = ContextConvGRU(hd[1], dtype=self.dtype, name="gru16")(
                    net[1], inp[1], pool2x(net[0]), interp_fn(net[2], net[1])
                )
            else:
                net[1] = ContextConvGRU(hd[1], dtype=self.dtype, name="gru16")(
                    net[1], inp[1], pool2x(net[0])
                )
        if iter08:
            motion = BasicMotionEncoder(
                self.corr_levels, self.corr_radius, dtype=self.dtype,
                name="encoder",
            )(flow, corr)
            if self.n_gru_layers > 1:
                net[0] = ContextConvGRU(hd[2], dtype=self.dtype, name="gru08")(
                    net[0], inp[0], motion, interp_fn(net[1], net[0])
                )
            else:
                net[0] = ContextConvGRU(hd[2], dtype=self.dtype, name="gru08")(
                    net[0], inp[0], motion
                )
        if not update:
            return net
        delta_flow = FlowHead(dtype=self.dtype, name="flow_head")(net[0])
        factor = 2 ** self.n_downsample
        # in test_mode only the final iteration's mask is consumed;
        # callers skip the head on the others.  XLA already DCEs the
        # unused convs (measured ~0.5 ms of 120, not the naive ~8), so
        # the win is mostly smaller traces / faster compiles — outputs
        # identical (reference computes it every iteration,
        # raft_stereo.py:175)
        if not need_mask:
            return net, None, delta_flow
        m = nn.relu(
            Conv(256, (3, 3), padding=1, kernel_init=he_out(),
                    dtype=self.dtype, name="mask_conv1")(net[0])
        )
        # mask logits feed a softmax (probability math stays f32)
        mask = 0.25 * Conv(
            factor * factor * 9, (1, 1), kernel_init=he_out(),
            dtype=jnp.float32, name="mask_conv2",
        )(m)
        return net, mask, delta_flow
