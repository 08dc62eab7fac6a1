"""Device-mesh construction and sharding helpers (SPMD).

The reference's only parallelism is single-process
``torch.nn.DataParallel`` (trainer_DLC_GRU.py:102-106).  Here data
parallelism is expressed the TPU way: a ``jax.sharding.Mesh`` over all
devices with the batch sharded on the ``data`` axis and parameters
replicated; under ``jax.jit`` XLA compiles the gradient all-reduce (psum
over ICI within a slice, DCN across hosts) and the cross-device BatchNorm
statistics automatically — there is no hand-written communication backend
to maintain (SURVEY §2.12).

Multi-host: call ``jax.distributed.initialize()`` per host before building
the mesh; each host feeds only its addressable shard of the global batch
(``host_local_batch``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(
    dp: int, mp: int, devices: Optional[Sequence] = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """(data, model) mesh for optional tensor-sharded cost volumes."""
    devices = list(devices) if devices is not None else jax.devices()
    assert dp * mp == len(devices), (dp, mp, len(devices))
    return Mesh(np.array(devices).reshape(dp, mp), axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Rows (batch dim) split across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a pytree of parameters across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), params)


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Put every array of a batch dict with its batch dim sharded."""
    s = batch_sharding(mesh, axis_name)
    return {
        k: (jax.device_put(v, s) if hasattr(v, "ndim") else v)
        for k, v in batch.items()
    }


def host_local_batch(global_batch: int) -> int:
    """Per-host batch size for the multi-host input pipeline."""
    return global_batch // jax.process_count()


def pad_batch_to(batch: dict, size: int) -> dict:
    """Zero-pad the batch dim to ``size`` (divisibility by the mesh)."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.shape[0] < size:
            pad = [(0, size - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad)
        else:
            out[k] = v
    return out


from .wshard import (  # noqa: E402  (W-sharded pipeline, see wshard.py)
    allpairs_corr1d_wsharded,
    correlation_volume_wsharded,
    make_wsharded_initial_disparity,
)
from .raft_wshard import (  # noqa: E402  (whole-model W-sharded RAFT)
    make_wsharded_raft_eval,
    make_wsharded_raft_train,
)
from .fsdp import (  # noqa: E402  (ZeRO-style sharded state, see fsdp.py)
    fsdp_shardings,
    fsdp_spec,
    shard_state_fsdp,
)
