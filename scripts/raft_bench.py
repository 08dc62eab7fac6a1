"""RAFT-Stereo throughput: eval forward at the reference evaluation
resolution (576×960, 12 iters, test_mode — raft_stereo.py:166-199 /
SceneflowLoader.py:124-130) and the jitted train step at the RAFT-Stereo
paper's crop (320×720, batch 4, sequence loss).  Pipelined-dispatch
protocol (CLAUDE.md): N steps queued, one ``float()`` sync.

Numbers land in BENCHMARKS.md "Secondary models".
"""
import sys, time

sys.path.insert(0, "/root/repo")

from stereoformer_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stereoformer_tpu.models import RAFTStereo
from stereoformer_tpu.losses import sequence_loss


def main():
    rng = np.random.default_rng(0)
    model = RAFTStereo(dtype=jnp.bfloat16)

    # --- eval forward, B=2 @ 576x960, 12 iters -------------------------
    B, H, W = 2, 576, 960
    l = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    params = jax.jit(
        lambda k, a, b: model.init(k, a, b, 12, None, True, False)
    )(jax.random.PRNGKey(0), l, r)
    fwd = jax.jit(
        lambda p, a, b: model.apply(p, a, b, iters=12, test_mode=True,
                                    train=False)["disparities"][-1]
    )
    y = fwd(params, l, r)
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        y = fwd(params, l, r)
    float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"eval B={B} @ {H}x{W} 12 iters: {dt:.1f} ms/batch "
          f"({B / dt * 1e3:.1f} pairs/s)")

    # --- train step, B=4 @ 320x720, 12 iters, sequence loss ------------
    B, H, W = 4, 320, 720
    l = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 192, (B, H, W, 1)), jnp.float32)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, 12, None, False, True)
    )(jax.random.PRNGKey(0), l, r)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(2e-4)
    opt_state = jax.jit(tx.init)(params)

    def step(params, bstats, opt_state, l, r, gt):
        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": bstats}, l, r, iters=12,
                train=True, mutable=["batch_stats"],
            )
            return sequence_loss(out["disparities"], gt), new_vars
        (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_vars["batch_stats"], opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    params, bstats, opt_state, loss = jstep(params, bstats, opt_state, l, r, gt)
    float(loss)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        params, bstats, opt_state, loss = jstep(params, bstats, opt_state,
                                                l, r, gt)
    float(loss)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"train B={B} @ {H}x{W} 12 iters: {dt:.1f} ms/step "
          f"({B / dt * 1e3:.1f} pairs/s)")


if __name__ == "__main__":
    main()
