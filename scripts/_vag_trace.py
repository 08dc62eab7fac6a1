"""Capture a device trace of a model's value_and_grad for hlo_stats
attribution.  usage: _vag_trace.py <outdir> [bf16|f32] [model] — then
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/hlo_stats.py <outdir>

TRACE_STEP=full traces the production train step instead
(make_train_step: loss + grad + amsgrad update, donated state) — the
step whose buffer donation removes the copy-dones a raw vag pays.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereoformer_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from stereoformer_tpu.models import get_model
from stereoformer_tpu.losses import sequence_loss

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vag_trace"
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bf16"
MODEL = sys.argv[3] if len(sys.argv) > 3 else "LowCNN_gru"
B = int(os.environ.get("PHASE_B", "4"))
H, W = (320, 720) if MODEL.startswith("RAFT") else (320, 640)
ITERS = 12

kw = {"dtype": jnp.bfloat16} if DTYPE == "bf16" else {}
model = get_model(MODEL, **kw)
rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
gt = jnp.asarray((40 + 10 * rng.randn(B, H, W, 1)).astype(np.float32))

variables = jax.jit(
    lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
)(left, right)
params, batch_stats = variables["params"], variables["batch_stats"]


def vag(params, batch_stats, l, r, g):
    def fwd(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": batch_stats}, l, r,
            iters=ITERS, train=True, mutable=["batch_stats"],
        )
        return sequence_loss(out["disparities"], g), upd

    (loss, upd), grads = jax.value_and_grad(fwd, has_aux=True)(params)
    return loss, upd, grads


if os.environ.get("TRACE_STEP", "") == "full":
    import optax

    from stereoformer_tpu.train import TrainState, make_train_step

    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=jax.jit(tx.init)(params),
    )
    step = make_train_step(model, tx, loss_name="sequence", iters=ITERS)
    batch = {"img_left": left, "img_right": right, "gt_disp": gt}
    state, m = step(state, batch)
    float(m["loss"])
    with jax.profiler.trace(OUT):
        for _ in range(6):
            state, m = step(state, batch)
        float(m["loss"])
else:
    c = jax.jit(vag).lower(params, batch_stats, left, right, gt).compile()
    out = c(params, batch_stats, left, right, gt)
    float(out[0])
    with jax.profiler.trace(OUT):
        outs = [c(params, batch_stats, left, right, gt) for _ in range(6)]
        float(outs[-1][0])
print("trace written to", OUT)
