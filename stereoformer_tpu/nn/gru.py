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

orthogonal = nn.initializers.orthogonal


class ConvGRU(nn.Module):
    """z/b/g ConvGRU (update.py:17-49). ``softsign=True`` swaps tanh for
    softsign on the candidate gate (update.py:31-34)."""

    hidden_dim: int
    softsign: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: Optional[jnp.ndarray]) -> jnp.ndarray:
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (self.hidden_dim,), x.dtype)
        conv = lambda name: nn.Conv(
            self.hidden_dim, (3, 3), padding=1,
            kernel_init=orthogonal(), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name=name,
        )
        xh = jnp.concatenate([x, h], axis=-1)
        z = nn.sigmoid(conv("conv_z")(xh))
        b = nn.sigmoid(conv("conv_b")(xh))
        s = jnp.concatenate([b * h, x], axis=-1)
        g = conv("conv_g")(s)
        g = nn.soft_sign(g) if self.softsign else nn.tanh(g)
        return (1.0 - z) * h + z * g


class SepConvGRU(nn.Module):
    """RAFT separable ConvGRU: horizontal (1×5) then vertical (5×1) gated
    updates (update/update.py:35-63)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        def gated(h, x, ksize, suffix):
            hx = jnp.concatenate([h, x], axis=-1)
            conv = lambda name: nn.Conv(
                self.hidden_dim, ksize, padding="SAME", name=name + suffix
            )
            z = nn.sigmoid(conv("convz")(hx))
            r = nn.sigmoid(conv("convr")(hx))
            q = nn.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)))
            return (1 - z) * h + z * q

        h = gated(h, x, (1, 5), "1")
        h = gated(h, x, (5, 1), "2")
        return h
