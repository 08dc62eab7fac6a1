"""Measure compile time vs steady-state throughput for the GRU loop modes.

loop="scan" traces the GRU update once (cheap compile) but denies XLA the
cross-iteration fusion window that makes loop="unroll" 2x faster at steady
state (BENCHMARKS.md "GRU loop modes").  lax.scan(unroll=k) is the middle
point: body traced once, emitted k times per loop step.  This script
measures the (compile seconds, pairs/s) frontier on the eval forward at
the bench configuration.

Usage: python scripts/_scan_unroll_bench.py [k ...]   (default 1 4)
NOTE: compile times are only meaningful on a cold cache entry; re-runs
load from the persistent cache in ~seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereoformer_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from stereoformer_tpu.models import get_model

H, W, B, ITERS = 576, 960, 8, 12


def measure(loop: str, k: int):
    kw = {"loop": loop, "dtype": jnp.bfloat16}
    if loop == "scan":
        kw["scan_unroll"] = k
    model = get_model("LowCNN_gru", **kw)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                train=False)
    )(left, right)

    def infer(v, l, r):
        return model.apply(v, l, r, iters=ITERS, train=False)["disparities"][-1]

    t0 = time.perf_counter()
    compiled = jax.jit(infer).lower(variables, left, right).compile()
    t_compile = time.perf_counter() - t0
    float(jnp.sum(compiled(variables, left, right)))   # warmup + sync
    reps = 20
    t0 = time.perf_counter()
    outs = [compiled(variables, left, right) for _ in range(reps)]
    float(jnp.sum(outs[-1]))
    dt = time.perf_counter() - t0
    print(f"loop={loop} unroll={k}: compile {t_compile:7.1f}s, "
          f"{reps * B / dt:7.1f} pairs/s ({dt / reps * 1e3:6.2f} ms/batch)",
          flush=True)


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [1, 4]
    for k in ks:
        measure("scan", k)
