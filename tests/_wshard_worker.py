"""Worker for tests/test_multiprocess.py::test_two_process_wshard_ring:
one of 2 processes × 2 virtual CPU devices forming a 4-device mesh whose
single axis plays the WIDTH role — every ``ppermute`` in the W-sharded
ring-correlation and whole-model RAFT drivers crosses a real process
boundary (round-4 verdict #5: until now those rings only ran in-process
on the virtual mesh).

Usage: python _wshard_worker.py <process_id> <num_processes> <port>

Checks, each against the unsharded computation on the same values:
1. ``allpairs_corr1d_wsharded`` — the ring exchange of right-feature
   stripes (reference op corr/corr.py:104-111).
2. ``make_wsharded_raft_eval`` at real halo geometry (margin=384,
   halo16=8) — encoder-slab masked psums, the corr ring, and the
   per-iteration halo re-exchange all span the host boundary.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from stereoformer_tpu.parallel.distributed import initialize_multihost

    assert initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from stereoformer_tpu import ops, parallel
    from stereoformer_tpu.models import RAFTStereo
    from stereoformer_tpu.parallel import make_wsharded_raft_eval
    from stereoformer_tpu.parallel.wshard import allpairs_corr1d_wsharded

    mesh = parallel.make_mesh(jax.devices())   # 4 devices, axis "data"
    n = mesh.devices.size
    assert n == 4, n

    # --- 1. ring correlation: inputs generated inside jit (device-side,
    # identical across processes), error reduced to a replicated scalar
    spec = P(None, None, "data", None)
    ring = jax.shard_map(
        lambda a, b: allpairs_corr1d_wsharded(a, b, "data"),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec,
    )

    @jax.jit
    def corr_err():
        key = jax.random.PRNGKey(0)
        fl = jax.random.normal(key, (1, 4, 16 * n, 16))
        fr = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 16 * n, 16))
        return jnp.abs(ring(fl, fr) - ops.allpairs_corr1d(fl, fr)).max()

    cerr = float(corr_err())
    assert cerr < 1e-5, cerr

    # --- 2. whole-model W-sharded RAFT eval across the host boundary,
    # parity vs the unsharded apply at real halo geometry
    model = RAFTStereo(hidden_dims=(16, 16, 16))
    B, H, W, iters = 1, 16, 256 * n, 2
    rng = np.random.RandomState(0)
    left = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                train=True)
    )(left[:, :, :128], right[:, :, :128])

    ref = jax.jit(
        lambda l, r: model.apply(
            variables, l, r, iters=iters, test_mode=True, train=False
        )["disparities"][-1]
    )(left, right)
    run = make_wsharded_raft_eval(mesh, model, variables, iters=iters,
                                  margin=384, halo16=8)
    out = run(left, right)
    rerr = float(jax.jit(lambda a, b: jnp.abs(a - b).max())(out, ref))
    assert rerr < 1e-2, rerr

    print(f"WSHARD_OK {pid} corr_err={cerr:.2e} raft_err={rerr:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
