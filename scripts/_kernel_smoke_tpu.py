"""TPU compile smoke + micro-bench for the round-3 kernels:
  (a) fused local-refine VJP (ops/pallas/local_refine.py backward),
  (b) Pallas dw kernel (ops/pallas/dw_conv.py).
Interpret-mode parity lives in tests/; this checks Mosaic actually
compiles them and times them against the XLA forms at flagship shapes.
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

from stereoformer_tpu import ops
from stereoformer_tpu.ops.pallas import fused_local_soft_argmin
from stereoformer_tpu.ops.convgrad import conv2d_pallas_dwgrad, resolve_padding


def bench(fn, args, reps=50):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    float(jax.tree.leaves(outs[-1])[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.RandomState(0)
    print(f"devices={jax.devices()}", file=sys.stderr, flush=True)

    # (a) local refine fwd+bwd at the flagship 1/8 train shape
    B, H8, W8, D, S = 4, 40, 80, 24, 21
    vol = jnp.asarray(rng.randn(B, H8, W8, D).astype(np.float32))
    cands = jnp.asarray(
        rng.uniform(-1, 25, (B, H8, W8, S)).astype(np.float32))

    def f_pal(v, c):
        return jnp.sum(fused_local_soft_argmin(v, c))

    def f_xla(v, c):
        return jnp.sum(ops.local_soft_argmin(v, c))

    gp = jax.jit(jax.grad(f_pal, (0, 1)))
    gx = jax.jit(jax.grad(f_xla, (0, 1)))
    a = gp(vol, cands)
    b = gx(vol, cands)
    err = max(float(jnp.abs(x - y).max()) for x, y in zip(a, b))
    tp, tx_ = bench(gp, (vol, cands)), bench(gx, (vol, cands))
    print(f"local_refine vjp: max_grad_err {err:.2e}  "
          f"pallas {tp*1e3:.3f} ms  xla {tx_*1e3:.3f} ms", flush=True)

    # (b) dw kernel at the dominant conv shapes
    for (label, B_, H, W, C, Co, k) in [
        ("rb128 s1 1/4", 4, 80, 160, 128, 128, 3),
        ("rb256 s1 1/8", 4, 40, 80, 256, 256, 3),
        ("gru_zb 1/8", 4, 40, 80, 128, 128, 3),
        ("mask1 1/8", 4, 40, 80, 64, 256, 3),
        ("agg24 1/8", 4, 40, 80, 24, 24, 3),
        ("full-res64", 4, 320, 640, 64, 64, 3),
    ]:
        x = jnp.asarray(rng.randn(B_, H, W, C), jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.randn(k, k, C, Co), jnp.bfloat16)
        pads = resolve_padding((k - 1) // 2, x.shape, (k, k), (1, 1))

        def f_p(x, w):
            return jnp.sum(
                conv2d_pallas_dwgrad(x, w, (1, 1), pads).astype(jnp.float32))

        def f_x(x, w):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, w, (1, 1), pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32))

        gp = jax.jit(jax.grad(f_p, (0, 1)))
        gx = jax.jit(jax.grad(f_x, (0, 1)))
        ap, ax_ = gp(x, w), gx(x, w)
        dwerr = float(jnp.abs(ap[1].astype(jnp.float32)
                              - ax_[1].astype(jnp.float32)).max())
        rel = dwerr / float(jnp.abs(ax_[1].astype(jnp.float32)).max())
        t_p, t_x = bench(gp, (x, w)), bench(gx, (x, w))
        print(f"dw {label:14s} rel_err {rel:.2e}  pallas {t_p*1e3:7.3f} ms  "
              f"xla {t_x*1e3:7.3f} ms  ratio {t_x/t_p:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
