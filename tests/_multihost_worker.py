"""Worker for tests/test_multiprocess.py: one of N processes in a real
``jax.distributed`` run on the CPU backend.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent), so
2 processes form a 4-device global mesh — the smallest honest multi-host
topology: a host boundary AND >1 local device per host.  Runs one jitted
SPMD train step of the flagship model on a deterministic global batch and
prints the loss; the parent compares it to the single-process value.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from stereoformer_tpu.parallel.distributed import (
        global_batch_from_host_local,
        host_shard_slice,
        initialize_multihost,
    )

    assert initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    import optax

    from stereoformer_tpu import parallel
    from stereoformer_tpu.models import get_model
    from stereoformer_tpu.train import TrainState, make_train_step

    mesh = parallel.make_mesh(jax.devices())   # global mesh, all hosts

    model = get_model("LowCNN_gru", loop="scan")
    H, W, GLOBAL_B = 32, 64, 4
    left = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, l: model.init(k, l, l, iters=1, train=False)
    )(jax.random.PRNGKey(0), left)
    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=jax.jit(tx.init)(variables["params"]),
    )
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, parallel.replicated(mesh)), state
    )

    # deterministic GLOBAL batch; this host materialises only its slice
    rng = np.random.RandomState(0)
    full = {
        "img_left": rng.randn(GLOBAL_B, H, W, 3).astype(np.float32),
        "img_right": rng.randn(GLOBAL_B, H, W, 3).astype(np.float32),
        "gt_disp": np.abs(rng.randn(GLOBAL_B, H, W, 1)).astype(np.float32) * 20,
    }
    sl = host_shard_slice(GLOBAL_B)
    local = {k: v[sl] for k, v in full.items()}
    batch = global_batch_from_host_local(local, mesh)

    step = make_train_step(model, tx, "sequence", iters=2)
    new_state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert int(jax.device_get(
        jax.tree_util.tree_leaves(new_state.step)[0])) == 1
    print(f"MULTIHOST_LOSS {pid} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
