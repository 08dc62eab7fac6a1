"""A/B the RAFT-Stereo train step with/without per-iteration update-block
checkpointing (RAFTStereo.remat_update) at the bench config.

Round-4 roofline finding (BENCHMARKS "round-4 roofline"): at B=4 @
320×720 ×12 iters the un-checkpointed step's activation footprint pushes
XLA into HLO rematerialisation of the ENCODERS — the full-res stem convs
appear twice (fusion.NNNN + .remat, ~8 ms/step of pure recompute) and
the encoder-backward fusions re-read activations at ~320 GiB/s.
Checkpointing the 1/4-res update block instead trades cheap recompute
for expensive implicit recompute.  This measures both, plus compiler
peak-memory from memory_analysis().

usage: python scripts/_raft_remat_bench.py   (TPU)
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
import optax

from stereoformer_tpu.models import RAFTStereo
from stereoformer_tpu.losses import sequence_loss

B, H, W, ITERS = 4, 320, 720, 12
rng = np.random.RandomState(0)
left = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
gt = jnp.asarray(rng.uniform(0, 192, (B, H, W, 1)).astype(np.float32))

for remat in (False, True):
    model = RAFTStereo(dtype=jnp.bfloat16, remat_update=remat)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, 1, None,
                                False, True)
    )(left, right)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-4)
    opt_state = jax.jit(tx.init)(params)

    def step(params, bstats, opt_state, l, r, g):
        def loss_fn(p):
            out, nv = model.apply(
                {"params": p, "batch_stats": bstats}, l, r,
                iters=ITERS, train=True, mutable=["batch_stats"],
            )
            return sequence_loss(out["disparities"], g), nv

        (loss, nv), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, nv["batch_stats"], opt_state, loss

    c = jax.jit(step, donate_argnums=(0, 1, 2)).lower(
        params, bstats, opt_state, left, right, gt).compile()
    try:
        ma = c.memory_analysis()
        peak = getattr(ma, "peak_memory_in_bytes", None)
        temp = getattr(ma, "temp_size_in_bytes", None)
    except Exception:
        peak = temp = None
    params, bstats, opt_state, loss = c(params, bstats, opt_state,
                                        left, right, gt)
    print(f"remat_update={remat}: loss={float(loss):.3f} "
          f"peak={peak and peak/2**30:.2f} GiB temp={temp and temp/2**30:.2f}"
          f" GiB", flush=True)
    reps = 15
    t0 = time.perf_counter()
    for _ in range(reps):
        params, bstats, opt_state, loss = c(params, bstats, opt_state,
                                            left, right, gt)
    float(loss)
    dt = (time.perf_counter() - t0) / reps
    print(f"remat_update={remat}: {dt*1e3:.1f} ms/step "
          f"({B/dt:.2f} pairs/s)", flush=True)
