"""Phase decomposition of a model's train step: forward+loss alone,
value_and_grad (fwd+bwd), and the full optimizer step, at the reference
train config — attributes the step time to forward vs backward vs
optimizer and reports per-phase MFU from XLA's own FLOP count.

usage: train_phase_bench.py [bf16|f32] [LowCNN_gru|RAFT_Stereo|...]

The eval forward runs at ~43% of bf16 peak (BENCHMARKS.md MFU matrix);
this script answers where the train step's budget goes.
Pipelined-dispatch protocol (CLAUDE.md).
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

from stereoformer_tpu.models import get_model
from stereoformer_tpu.train import TrainState, make_train_step
from stereoformer_tpu.losses import sequence_loss

MODEL = sys.argv[2] if len(sys.argv) > 2 else "LowCNN_gru"
# RAFT trains at the RAFT-Stereo paper crop 320x720 (raft_bench.py row)
B = int(os.environ.get("PHASE_B", "4"))
H, W = (320, 720) if MODEL.startswith("RAFT") else (320, 640)
ITERS = 12
DTYPE = sys.argv[1] if len(sys.argv) > 1 else "bf16"
if DTYPE not in ("bf16", "f32"):
    sys.exit(f"usage: train_phase_bench.py [bf16|f32] [model] (got {DTYPE!r})")
# v5e matmul peak for the chosen dtype (f32 runs on the MXU at half the
# bf16 rate) — '% peak' is always against the dtype actually benchmarked
PEAK_TFLOPS = {"bf16": 197.0, "f32": 98.5}[DTYPE]

kw = {}
if DTYPE == "bf16":
    kw["dtype"] = jnp.bfloat16
model = get_model(MODEL, **kw)
rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
gt = jnp.asarray((40 + 10 * rng.randn(B, H, W, 1)).astype(np.float32))

variables = jax.jit(
    lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
)(left, right)
params, batch_stats = variables["params"], variables["batch_stats"]
loss_fn = sequence_loss


def fwd_loss(params, batch_stats, l, r, g):
    out, upd = model.apply(
        {"params": params, "batch_stats": batch_stats}, l, r,
        iters=ITERS, train=True, mutable=["batch_stats"],
    )
    return loss_fn(out["disparities"], g), upd


def vag(params, batch_stats, l, r, g):
    (loss, upd), grads = jax.value_and_grad(
        lambda p: fwd_loss(p, batch_stats, l, r, g), has_aux=True
    )(params)
    return loss, upd, grads


tx = optax.amsgrad(1e-3)
state = TrainState(
    step=jnp.asarray(0, jnp.int32), params=params, batch_stats=batch_stats,
    opt_state=jax.jit(tx.init)(params),
)
full_step = make_train_step(model, tx, loss_name="sequence", iters=ITERS)


def timed(name, compiled, args, sync):
    # warmup
    sync(compiled(*args))
    reps = 30
    t0 = time.perf_counter()
    outs = [compiled(*args) for _ in range(reps)]
    sync(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    gflop = float(cost.get("flops", 0.0)) / 1e9
    tfs = gflop / dt / 1e3
    print(f"{name:18s} {dt * 1e3:7.2f} ms  {gflop:8.1f} GFLOP  "
          f"{tfs:6.1f} TF/s  {100 * tfs / PEAK_TFLOPS:5.1f}% peak",
          flush=True)
    return dt


c_fwd = jax.jit(fwd_loss).lower(params, batch_stats, left, right, gt).compile()
c_vag = jax.jit(vag).lower(params, batch_stats, left, right, gt).compile()
batch = {"img_left": left, "img_right": right, "gt_disp": gt}

t_f = timed("fwd+loss (train)", c_fwd, (params, batch_stats, left, right, gt),
            lambda o: float(o[0]))
t_g = timed("value_and_grad", c_vag, (params, batch_stats, left, right, gt),
            lambda o: float(o[0]))

# full step via make_train_step (donates state; re-init per rep not needed —
# keep a fresh state chain like train_step_bench.py)
st = state
st, m = full_step(st, batch)          # warmup/compile
float(m["loss"])
reps = 30
t0 = time.perf_counter()
for _ in range(reps):
    st, m = full_step(st, batch)
float(m["loss"])
t_s = (time.perf_counter() - t0) / reps
print(f"{'full step':18s} {t_s * 1e3:7.2f} ms")
print(f"backward (vag-fwd): {1e3 * (t_g - t_f):.2f} ms  "
      f"optimizer+rest (step-vag): {1e3 * (t_s - t_g):.2f} ms")
