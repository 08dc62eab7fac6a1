"""Multi-host SPMD utilities.

The reference has no multi-node anything (SURVEY §2.12); its DataParallel
equivalent here scales across a TPU pod slice the JAX way:

1. every host calls :func:`initialize_multihost` (jax.distributed) before
   first device use,
2. one global mesh is built over ``jax.devices()`` (all hosts' chips),
3. each host's input pipeline loads only its shard of the global batch
   (``host_shard_slice``) and assembles a global array with
   :func:`global_batch_from_host_local`,
4. the jitted train step runs unchanged — XLA compiles the gradient
   all-reduce over ICI within a slice and DCN across hosts.

Everything also works single-host (process_count() == 1) where these
helpers reduce to identity/plain device_put.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from . import batch_sharding


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod runtime's automatic configuration).  Returns True when a
    multi-process run was initialised."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # on TPU pods jax.distributed.initialize() self-configures; on
        # CPU/single-host there is nothing to do
        if os.environ.get("TPU_WORKER_HOSTNAMES") not in (None, "localhost"):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_shard_slice(global_batch: int) -> slice:
    """The [start, stop) row range of the global batch this host loads."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def global_batch_from_host_local(batch: dict, mesh, axis_name: str = "data"):
    """Assemble a global, batch-sharded Array from each host's local rows.

    ``batch`` holds this host's rows only; the result behaves as the full
    global batch inside jit.  Single-process: a plain sharded device_put.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return {
            k: (jax.device_put(v, sharding) if hasattr(v, "ndim") else v)
            for k, v in batch.items()
        }
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim"):
            out[k] = v
            continue
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out
