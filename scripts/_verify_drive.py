"""/verify drive: compose the public ops/models exactly as the hot path
does (SURVEY §3.3) at reference scale, jit forward + grad on the REAL
TPU, and check shapes/dtype/finiteness/valid-fraction/timing; probes:
bf16 end-to-end, out-of-range disparity collapse, odd shapes, 576x960
eval timing.  (CLI dummy-train step 4 runs separately.)
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

from stereoformer_tpu import ops
from stereoformer_tpu.models import get_model
from stereoformer_tpu.losses import sequence_loss

ok = True


def check(name, cond, detail=""):
    global ok
    status = "PASS" if cond else "FAIL"
    ok = ok and cond
    print(f"[verify] {status} {name} {detail}", flush=True)


def main():
    global ok
    rng = np.random.RandomState(0)
    print(f"[verify] devices={jax.devices()}", flush=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    # --- 1. hot-path composition at reference train scale, fwd + grad ---
    B, H, W = 4, 320, 640
    model = get_model("LowCNN_gru", dtype=jnp.bfloat16)
    left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    gt = jnp.asarray((40 + 10 * rng.randn(B, H, W, 1)).astype(np.float32))
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                train=False)
    )(left, right)

    def loss_fn(params, l, r, g):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            l, r, iters=12, train=True, mutable=["batch_stats"],
        )
        return sequence_loss(out["disparities"], g), out["disparities"][-1]

    t0 = time.perf_counter()
    vag = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss, disp), grads = vag(variables["params"], left, right, gt)
    lv = float(loss)
    t_compile = time.perf_counter() - t0
    check("train fwd+grad finite", np.isfinite(lv), f"loss={lv:.3f} "
          f"compile+1step={t_compile:.1f}s")
    check("disp shape/dtype", disp.shape == (B, H, W, 1)
          and disp.dtype == jnp.float32, f"{disp.shape} {disp.dtype}")
    leaves = jax.tree.leaves(grads)
    finite = all(bool(jnp.isfinite(l_).all()) for l_ in leaves)
    nonzero = sum(float(jnp.abs(l_).sum()) > 0 for l_ in leaves)
    check("grads finite", finite, f"{len(leaves)} leaves")
    check("grads nonzero", nonzero > len(leaves) * 0.9,
          f"{nonzero}/{len(leaves)} nonzero")
    reps = 10
    t0 = time.perf_counter()
    outs = [vag(variables["params"], left, right, gt) for _ in range(reps)]
    float(outs[-1][0][0])
    dt = (time.perf_counter() - t0) / reps
    check("train vag steady", dt < 0.2, f"{dt * 1e3:.1f} ms/step")

    # --- 3a. out-of-range disparity candidates collapse to cur_disp ---
    vol = jnp.asarray(rng.randn(1, 8, 16, 24).astype(np.float32))
    cur = jnp.full((1, 8, 16, 1), 5.0)
    cands = ops.make_candidates(cur - 30.0, cur + 30.0, cur, 20, 24,
                                consider_valid=True)
    collapse = bool(jnp.all(cands == 5.0))
    check("invalid-range collapse", collapse)

    # --- 3b. odd, non-multiple-of-8-adjacent shapes through the ops ---
    volo = jnp.asarray(rng.randn(2, 13, 31, 24).astype(np.float32))
    do = ops.soft_argmin(volo)[..., None]
    ro = ops.local_soft_argmin(
        volo, ops.make_candidates(do - 2, do + 2, do, 20, 24))
    check("odd-shape ops finite", bool(jnp.isfinite(ro).all()),
          f"{ro.shape}")

    # --- 3c. eval at 576x960 (bf16 path), timing ---
    He, We, Be = 576, 960, 8
    le = jnp.asarray(rng.randn(Be, He, We, 3).astype(np.float32))
    re_ = jnp.asarray(rng.randn(Be, He, We, 3).astype(np.float32))
    fwd = jax.jit(lambda v, a, b: model.apply(
        v, a, b, iters=12, train=False)["disparities"][-1])
    y = fwd(variables, le, re_)
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fwd(variables, le, re_) for _ in range(10)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    dte = (time.perf_counter() - t0) / 10
    check("eval 576x960 finite", bool(jnp.isfinite(y).all()),
          f"{Be / dte:.1f} pairs/s")

    print("[verify] ALL PASS" if ok else "[verify] FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
