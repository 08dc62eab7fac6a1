"""Multi-host helpers + scaling harness on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from stereoformer_tpu import parallel
from stereoformer_tpu.parallel.distributed import (
    global_batch_from_host_local,
    host_shard_slice,
    initialize_multihost,
)


def test_initialize_multihost_single_process_noop():
    assert initialize_multihost() is False
    assert jax.process_count() == 1


def test_host_shard_slice_single():
    s = host_shard_slice(16)
    assert (s.start, s.stop) == (0, 16)


def test_global_batch_from_host_local():
    mesh = parallel.make_mesh()
    batch = {"img_left": np.random.rand(8, 4, 4, 3).astype(np.float32),
             "left_name": ["a"] * 8}
    out = global_batch_from_host_local(batch, mesh)
    arr = out["img_left"]
    assert arr.shape == (8, 4, 4, 3)
    # one shard per device
    assert len(arr.addressable_shards) == 8
    assert out["left_name"] == ["a"] * 8


def test_scaling_bench_runs():
    from stereoformer_tpu.cli.scaling_bench import main

    results = main([
        "--per_device_batch", "1", "--crop_h", "32", "--crop_w", "64",
        "--iters", "1", "--reps", "2",
    ])
    assert [r["devices"] for r in results] == [1, 2, 4, 8]
    assert results[0]["efficiency"] == 1.0
    for r in results:
        assert np.isfinite(r["pairs_per_s"]) and r["pairs_per_s"] > 0


def test_pad_batch_to():
    batch = {"x": np.ones((3, 2)), "name": ["a"]}
    out = parallel.pad_batch_to(batch, 8)
    assert out["x"].shape == (8, 2)
    assert (out["x"][3:] == 0).all()
