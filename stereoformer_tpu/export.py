"""Model export for deployment: serialized StableHLO artifacts.

The reference deploys by shipping the training repo plus a ``.pth`` file
and re-instantiating the Python model class at serve time
(train_low.py:86-99 ``torch.load`` into the live module).  The TPU-native
deployment unit is different: ``jax.export`` lowers the jitted inference
function to StableHLO once, bakes the trained parameters in as constants
(letting XLA constant-fold BN scales at serve time), and serializes the
whole thing to a single portable artifact.  A server deserializes and
calls it with NO model code, NO flax, and NO checkpoint — just jax and
the bytes.

Batch-polymorphic: the batch dimension is exported symbolically
(``jax.export.symbolic_shape``), so one artifact serves any batch size;
H/W stay static because the resize/attention lowerings precompute
trace-time interpolation matrices from concrete shapes (ops/resize.py) —
export one artifact per serving resolution, which is also what keeps
every matmul statically tiled for the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_infer_fn(model, variables, iters: int = 12):
    """Inference closure with the trained parameters baked in."""

    def infer(left, right):
        out = model.apply(variables, left, right, iters=iters, train=False)
        return out["disparities"][-1]

    return infer


def export_model(
    model,
    variables,
    height: int,
    width: int,
    iters: int = 12,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower + export the eval forward; returns ``jax.export.Exported``.

    ``batch=None`` exports a symbolic batch dimension (one artifact, any
    batch size).  ``platforms`` lowers for other backends than the
    current one (e.g. ``["tpu"]`` from a CPU build host).
    """
    from jax import export as jexport

    infer = jax.jit(make_infer_fn(model, variables, iters=iters))
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        shape = (b, height, width, 3)
    else:
        shape = (batch, height, width, 3)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(infer, **kwargs)(spec, spec)


def save_exported(exported, path: str) -> int:
    """Serialize an ``Exported`` to ``path``; returns the byte size."""
    blob = exported.serialize()
    with open(path, "wb") as fh:
        fh.write(blob)
    return len(blob)


def load_exported(path: str):
    """Deserialize an artifact; ``.call(left, right)`` runs it (jittable,
    shardable, differentiable-if-exported-with-vjp — plain jax, no model
    code)."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        return jexport.deserialize(fh.read())


def infer_exported(exported, left, right):
    """Run an exported artifact under jit (compiled once per shape)."""

    @functools.partial(jax.jit)
    def run(l, r):
        return exported.call(l, r)

    return run(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32))
