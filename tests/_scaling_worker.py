"""Worker for tests/test_multiprocess.py::test_multiprocess_scaling_bench:
one of N processes driving ``cli.scaling_bench`` in multi-process mode
(per-host input-shard assembly + several steps under
``jax.process_count() > 1``).

Usage: python _scaling_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from stereoformer_tpu.cli.scaling_bench import main as bench_main

    results = bench_main([
        "--net", "LowCNN_gru",
        "--per_device_batch", "1",
        "--crop_h", "32", "--crop_w", "64",
        "--iters", "1", "--reps", "3",
        "--coordinator", f"localhost:{port}",
        "--num_processes", str(nprocs),
        "--process_id", str(pid),
    ])
    # every process computed the same global topology
    assert results[-1]["processes"] == nprocs, results
    print(f"SCALING_OK {pid} {results[-1]['devices']} "
          f"{results[-1]['pairs_per_s']:.6f}", flush=True)


if __name__ == "__main__":
    main()
