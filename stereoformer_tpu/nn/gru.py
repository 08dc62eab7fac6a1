"""Convolutional GRU cells.

- ``ConvGRU``: the z/b/g-gated cell of the local-cost-volume models
  (Attempts/update.py:17-49): z = σ(conv([x, h])) is the *update* gate,
  b = σ(conv([x, h])) gates the previous state, g = tanh(conv([b·h, x])),
  h' = (1 − z)·h + z·g.  Gate convs use orthogonal init, zero bias.
- ``SepConvGRU``: RAFT-Stereo's separable (1×5 then 5×1) GRU
  (models/IterativeLocalCostVolume/update/update.py:35-63).

All NHWC; the caller owns the hidden state (functional, scan-friendly).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from .conv import Conv

orthogonal = nn.initializers.orthogonal


def stacked_init(base, parts: int):
    """Initializer producing ``parts`` independent ``base``-initialized
    kernels stacked along the output-feature axis.  Used when gate convs
    over the same input are fused into one conv: the fused kernel is the
    channel-concatenation of per-gate kernels, so initializing each slice
    with ``base`` reproduces the unfused init distribution exactly (this
    matters for fan-out-dependent inits and orthogonal)."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        assert shape[-1] % parts == 0, (shape, parts)
        sub = shape[:-1] + (shape[-1] // parts,)
        keys = jax.random.split(key, parts)
        return jnp.concatenate([base(k, sub, dtype) for k in keys], axis=-1)

    return init


def stacked_orthogonal(parts: int):
    return stacked_init(orthogonal(), parts)


class ConvGRU(nn.Module):
    """z/b/g ConvGRU (update.py:17-49). ``softsign=True`` swaps tanh for
    softsign on the candidate gate (update.py:31-34).

    TPU layout note: the reference computes the z and b gates with two
    separate convs over the same ``[x, h]`` input (update.py:26-28); here
    they are one fused conv with ``2·hidden`` output channels, split
    after.  Bit-identical math (a conv is independent per output channel)
    with per-gate orthogonal init preserved via ``stacked_orthogonal``,
    and one full-width MXU contraction instead of two half-width ones."""

    hidden_dim: int
    softsign: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: Optional[jnp.ndarray]) -> jnp.ndarray:
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (self.hidden_dim,), x.dtype)
        xh = jnp.concatenate([x, h], axis=-1)
        zb = Conv(
            2 * self.hidden_dim, (3, 3), padding=1,
            kernel_init=stacked_orthogonal(2), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_zb",
        )(xh)
        z = nn.sigmoid(zb[..., : self.hidden_dim])
        b = nn.sigmoid(zb[..., self.hidden_dim :])
        s = jnp.concatenate([b * h, x], axis=-1)
        g = Conv(
            self.hidden_dim, (3, 3), padding=1,
            kernel_init=orthogonal(), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_g",
        )(s)
        g = nn.soft_sign(g) if self.softsign else nn.tanh(g)
        return (1.0 - z) * h + z * g


class SepConvGRU(nn.Module):
    """RAFT separable ConvGRU: horizontal (1×5) then vertical (5×1) gated
    updates (update/update.py:35-63).  The z and r gate convs over the
    shared ``[h, x]`` input are fused into one 2·hidden conv per
    direction (bit-identical; see ConvGRU layout note)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        def gated(h, x, ksize, suffix):
            hx = jnp.concatenate([h, x], axis=-1)
            zr = Conv(
                2 * self.hidden_dim, ksize, padding="SAME",
                name="convzr" + suffix,
            )(hx)
            z = nn.sigmoid(zr[..., : self.hidden_dim])
            r = nn.sigmoid(zr[..., self.hidden_dim :])
            q = nn.tanh(
                Conv(self.hidden_dim, ksize, padding="SAME",
                        name="convq" + suffix)(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            return (1 - z) * h + z * q

        h = gated(h, x, (1, 5), "1")
        h = gated(h, x, (5, 1), "2")
        return h
