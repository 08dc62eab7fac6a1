"""Data-parallel scaling-efficiency harness.

Measures jitted train-step throughput at 1, 2, 4, ..., N devices with the
per-device batch held constant (weak scaling) and reports efficiency
relative to 1 device — the BASELINE.md target is ≥85% at N ≥ 2 hosts.

Runs on any backend: the virtual 8-device CPU mesh
(``--platform cpu``, the CI configuration) or a real pod slice
(multi-host: launch one process per host after
``parallel.initialize_multihost``).

Usage:
  python -m stereoformer_tpu.cli.scaling_bench --platform cpu \
      --per_device_batch 1 --crop_h 64 --crop_w 128 --iters 2

Multi-process (one process per host; the per-host input pipeline feeds
only its shard, assembled into the global batch by
``global_batch_from_host_local``):
  python -m stereoformer_tpu.cli.scaling_bench --platform cpu \
      --coordinator localhost:9876 --num_processes 2 --process_id $i
In this mode only the full global mesh is measured (every process must
participate in every jit) and process 0 prints the JSON; compute
efficiency against a separately measured single-device run (pass
``--base_pairs_per_s``) — see tests/test_multiprocess.py.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser("stereoformer_tpu scaling_bench")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--net", default="LowCNN_gru")
    p.add_argument("--per_device_batch", type=int, default=1)
    p.add_argument("--crop_h", type=int, default=64)
    p.add_argument("--crop_w", type=int, default=128)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--coordinator", default=None,
                   help="host:port for jax.distributed (multi-process mode)")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--base_pairs_per_s", type=float, default=None,
                   help="single-device baseline for the efficiency column "
                        "(multi-process mode has no in-run 1-device row)")
    opt = p.parse_args(argv)

    import os

    if opt.platform == "cpu" and not opt.coordinator:
        # virtual multi-device CPU mesh (must precede backend init)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    if opt.coordinator:
        from ..parallel.distributed import initialize_multihost

        assert initialize_multihost(
            coordinator_address=opt.coordinator,
            num_processes=opt.num_processes,
            process_id=opt.process_id,
        ), "multi-process initialisation failed"

    import jax.numpy as jnp
    import numpy as np
    import optax

    from .. import parallel
    from ..models import get_model
    from ..train import TrainState, make_train_step

    devices = jax.devices()
    model = get_model(opt.net)
    H, W = opt.crop_h, opt.crop_w
    tx = optax.amsgrad(1e-4)
    results = []

    multiproc = jax.process_count() > 1
    if multiproc:
        # every process must participate in every jitted program, so only
        # the full global mesh is measurable in-run
        n_list = [len(devices)]
        from ..parallel.distributed import (
            global_batch_from_host_local,
            host_shard_slice,
        )
    else:
        n_list = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in n_list:
        mesh = parallel.make_mesh(devices[:n])
        B = opt.per_device_batch * n
        rng = np.random.RandomState(0)
        batch = {
            "img_left": rng.randn(B, H, W, 3).astype(np.float32),
            "img_right": rng.randn(B, H, W, 3).astype(np.float32),
            "gt_disp": np.abs(rng.randn(B, H, W, 1)).astype(np.float32) * 20,
        }
        if multiproc:
            # per-host input pipeline: materialise only this host's rows
            sl = host_shard_slice(B)
            batch = global_batch_from_host_local(
                {k: v[sl] for k, v in batch.items()}, mesh
            )
        else:
            batch = parallel.shard_batch(batch, mesh)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
        )(batch["img_left"][:1], batch["img_right"][:1])
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, parallel.replicated(mesh)), state
        )
        step = make_train_step(model, tx, "sequence", iters=opt.iters)
        state, m = step(state, batch)            # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(opt.reps):
            state, m = step(state, batch)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / opt.reps
        results.append({"devices": n, "global_batch": B, "step_s": dt,
                        "pairs_per_s": B / dt})

    base = opt.base_pairs_per_s or (
        None if multiproc else results[0]["pairs_per_s"]
    )
    for r in results:
        r["processes"] = jax.process_count()
        if base is not None:
            r["efficiency"] = r["pairs_per_s"] / (base * r["devices"])
    if jax.process_index() == 0:
        print("SCALING " + json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    main()
