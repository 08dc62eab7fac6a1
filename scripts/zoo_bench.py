"""Eval throughput for every registry model (the BENCHMARKS model-zoo
table): bf16, B=8 @ 576×960, 12 iterations, pipelined dispatch.

usage: python scripts/zoo_bench.py [model ...]   (default: all)
env: ZOO_REPS (default 10)
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

from stereoformer_tpu.models import available_models, get_model

B, H, W, ITERS = 8, 576, 960, 12
REPS = int(os.environ.get("ZOO_REPS", "10"))

names = sys.argv[1:] or available_models()
rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))

for name in names:
    t0 = time.perf_counter()
    try:
        kw = {"dtype": jnp.bfloat16}
        if name.startswith("LowCNN"):
            kw["loop"] = "unroll"
        model = get_model(name, **kw)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                    train=False)
        )(left, right)
        f = jax.jit(
            lambda v, l, r: model.apply(v, l, r, iters=ITERS, train=False)[
                "disparities"][-1]
        )
        y = f(variables, left, right)
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        float(jnp.sum(y.astype(jnp.float32)))
        t1 = time.perf_counter()
        outs = [f(variables, left, right) for _ in range(REPS)]
        float(jnp.sum(outs[-1].astype(jnp.float32)))
        dt = (time.perf_counter() - t1) / REPS
        print(f"{name:28s} {dt * 1e3:7.1f} ms/batch  {B / dt:7.1f} pairs/s"
              f"   (compile+warm {t1 - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:28s} ERROR {type(e).__name__}: {e}"[:200], flush=True)
