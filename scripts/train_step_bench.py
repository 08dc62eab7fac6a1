"""Sustained training-step throughput of the flagship at the reference
train config (crop 320×640, batch 4, 12 GRU iterations, sequence loss,
Adam-amsgrad) — the number behind BENCHMARKS.md "Sustained training".
Pipelined-dispatch protocol (CLAUDE.md): N steps queued, one float() sync."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np

from stereoformer_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import optax

from stereoformer_tpu.models import get_model
from stereoformer_tpu.train import TrainState, make_train_step

B, H, W, ITERS = 4, 320, 640, 12
MODE = sys.argv[1] if len(sys.argv) > 1 else "unroll"  # unroll | scan | scan:<k>
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "f32"

if MODE.startswith("scan:"):
    kw = {"loop": "scan", "scan_unroll": int(MODE.split(":", 1)[1])}
else:
    kw = {"loop": MODE}
if DTYPE == "bf16":
    kw["dtype"] = jnp.bfloat16
model = get_model("LowCNN_gru", **kw)
rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
gt = jnp.asarray((40 + 10 * rng.randn(B, H, W, 1)).astype(np.float32))

variables = jax.jit(
    lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
)(left, right)
tx = optax.amsgrad(1e-3)
state = TrainState(
    step=jnp.asarray(0, jnp.int32),
    params=variables["params"],
    batch_stats=variables["batch_stats"],
    opt_state=jax.jit(tx.init)(variables["params"]),
)
step_fn = make_train_step(model, tx, loss_name="sequence", iters=ITERS)
batch = {"img_left": left, "img_right": right, "gt_disp": gt}

t0 = time.perf_counter()
state, metrics = step_fn(state, batch)
print(f"[{MODE} {DTYPE}] cold compile+step {time.perf_counter()-t0:.0f}s "
      f"loss={float(metrics['loss']):.3f}", flush=True)

reps = 30
t0 = time.perf_counter()
for _ in range(reps):
    state, metrics = step_fn(state, batch)
float(metrics["loss"])
dt = time.perf_counter() - t0
print(f"[{MODE} {DTYPE}] {1e3*dt/reps:.1f} ms/step  {reps*B/dt:.1f} pairs/s "
      f"loss={float(metrics['loss']):.3f}", flush=True)
