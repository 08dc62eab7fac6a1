"""MFU experiment matrix (VERDICT item 2): eval throughput of the flagship
at 576x960x12iters across batch size and compute dtype, with XLA-cost-model
FLOP counting.  One process, sequential compiles (axon single-client)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from stereoformer_tpu.utils import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp
from stereoformer_tpu.models import get_model

H, W, ITERS = 576, 960, 12
PEAK = 197.0


def run(B, dtype_name):
    dt = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    model = get_model("LowCNN_gru", loop="unroll", **({"dtype": dt} if dt else {}))
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
    )(left, right)

    def infer(v, l, r):
        return jnp.sum(model.apply(v, l, r, iters=ITERS, train=False)["disparities"][-1])

    c = jax.jit(infer).lower(variables, left, right).compile()
    flops = None
    try:
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / B
    except Exception:
        pass
    s = float(c(variables, left, right))
    print(f"[{dtype_name} B={B}] compile+warm {time.perf_counter()-t0:.0f}s "
          f"out={s:.4g} finite={np.isfinite(s)}", flush=True)
    float(c(variables, left, right))
    reps = 20
    t0 = time.perf_counter()
    outs = [c(variables, left, right) for _ in range(reps)]
    float(outs[-1])
    dtm = time.perf_counter() - t0
    pps = reps * B / dtm
    line = f"[{dtype_name} B={B}] {pps:.1f} pairs/s"
    if flops:
        tf = flops * pps / 1e12
        line += f"  {flops/1e9:.1f} GF/pair  {tf:.1f} TF/s  {100*tf/PEAK:.1f}% bf16-peak"
    print(line, flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:] or ["f32:8", "bf16:4", "bf16:8"]:
        d, b = spec.split(":")
        run(int(b), d)
