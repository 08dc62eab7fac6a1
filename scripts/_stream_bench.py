"""Measure the device's ACHIEVABLE elementwise HBM bandwidth at the
model's hot shape — the calibration behind BENCHMARKS "round-4
roofline".  The per-op trace counters cluster at ~320 GiB/s, which
reads as "40% of the 819 GB/s nominal peak"; this shows a bare copy on
this v5e gets ~276 GB/s, i.e. the model's big elementwise fusions run
at ~90-100% of what the device measurably streams.

Pipelined-dispatch protocol (CLAUDE.md).  usage: python scripts/_stream_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereoformer_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.RandomState(0)
SHAPE = (4, 576, 960, 64)   # fnet layer1 activation (bf16, 135 MB)
x = jnp.asarray(rng.randn(*SHAPE).astype(np.float32)).astype(jnp.bfloat16)
y = jnp.asarray(rng.randn(*SHAPE).astype(np.float32)).astype(jnp.bfloat16)
NB = int(np.prod(SHAPE)) * 2


def bench(name, fn, traffic_bytes):
    f = jax.jit(fn)
    float(jnp.sum(f(x, y).astype(jnp.float32)))   # compile+warm
    reps = 30
    t0 = time.perf_counter()
    outs = [f(x, y) for _ in range(reps)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:7.3f} ms  {traffic_bytes / dt / 1e9:7.1f} "
          f"GB/s", flush=True)


def inorm(a, b):
    m = jnp.mean(a.astype(jnp.float32), axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(a.astype(jnp.float32) - m), axis=(1, 2),
                 keepdims=True)
    out = jax.nn.relu((a.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5))
    return out.astype(a.dtype) + b


bench("copy x          (r1 w1)", lambda a, b: a * 1.000244140625, 2 * NB)
bench("relu(x)         (r1 w1)", lambda a, b: jax.nn.relu(a), 2 * NB)
bench("x+y             (r2 w1)", lambda a, b: a + b, 3 * NB)
bench("relu(x)+y       (r2 w1)", lambda a, b: jax.nn.relu(a) + b, 3 * NB)
bench("instnorm+relu+add", inorm, 4 * NB)
