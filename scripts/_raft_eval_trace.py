"""Capture a device trace of the RAFT-Stereo EVAL forward for hlo_stats
attribution (VERDICT r4 item 1: give eval the same per-category HBM
roofline treatment the train step got).

usage: _raft_eval_trace.py <outdir> [B]   (bf16, 576x960, 12 iters,
test_mode — the BENCH_r04 eval rows' exact config).  Then:
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/hlo_stats.py <outdir>
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

from stereoformer_tpu.models import RAFTStereo

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raft_eval_trace"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
H, W = 576, 960
ITERS = 12

model = RAFTStereo(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
right = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)

params = jax.jit(
    lambda k, a, b: model.init(k, a, b, ITERS, None, True, False)
)(jax.random.PRNGKey(0), left, right)
fwd = jax.jit(
    lambda p, a, b: model.apply(p, a, b, iters=ITERS, test_mode=True,
                                train=False)["disparities"][-1]
)
y = fwd(params, left, right)
float(jnp.sum(y.astype(jnp.float32)))
print("compiled+warm", flush=True)

t0 = time.perf_counter()
N = 10
for _ in range(N):
    y = fwd(params, left, right)
float(jnp.sum(y.astype(jnp.float32)))
ms = (time.perf_counter() - t0) / N * 1e3
print(f"eval B={B} @ {H}x{W} {ITERS} iters: {ms:.1f} ms/batch", flush=True)

with jax.profiler.trace(OUT):
    for _ in range(6):
        y = fwd(params, left, right)
    float(jnp.sum(y.astype(jnp.float32)))
print("trace written to", OUT)
