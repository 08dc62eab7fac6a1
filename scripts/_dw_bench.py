"""A/B micro-bench: weight-gradient formulation of an NHWC conv.

Times value_and_grad of a single conv at the flagship's train-config
shapes (B=4 @ 320x640), comparing
  - xla: plain autodiff (dw emitted as a CHWN-re-laid-out conv)
  - tap: ops.convgrad.conv2d_tapgrad (per-tap (B,H,W)-contracting
         matmuls, native layout)
Pipelined-dispatch protocol (CLAUDE.md).  Run on TPU.
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

from stereoformer_tpu.ops.convgrad import conv2d_tapgrad, resolve_padding

DT = jnp.bfloat16

# (label, B, H, W, C, Co, k, stride)
SHAPES = [
    ("stem7x7 s2 3->64", 4, 320, 640, 3, 64, 7, 2),
    ("rb128 s2", 4, 160, 320, 64, 128, 3, 2),
    ("rb128 s1", 4, 80, 160, 128, 128, 3, 1),
    ("rb256 s2", 4, 80, 160, 128, 256, 3, 2),
    ("rb256 s1 (1/8)", 4, 40, 80, 256, 256, 3, 1),
    ("agg24 s1", 4, 40, 80, 24, 24, 3, 1),
    ("gru_zb 128->128", 4, 40, 80, 128, 128, 3, 1),
    ("mask1 64->256", 4, 40, 80, 64, 256, 3, 1),
    ("mask2 1x1 256->576", 4, 40, 80, 256, 576, 1, 1),
    ("shortcut1x1 s2 128->256", 4, 80, 160, 128, 256, 1, 2),
]


def bench(fn, args, reps=50):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    float(jax.tree.leaves(outs[-1])[0].sum().astype(jnp.float32))
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.RandomState(0)
    print(f"devices={jax.devices()}", file=sys.stderr, flush=True)
    for label, B, H, W, C, Co, k, s in SHAPES:
        x = jnp.asarray(rng.randn(B, H, W, C), DT)
        w = jnp.asarray(0.1 * rng.randn(k, k, C, Co), DT)
        pads = resolve_padding((k - 1) // 2, x.shape, (k, k), (s, s))

        def f_xla(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), pads, dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        def f_tap(x, w):
            return jnp.sum(
                conv2d_tapgrad(x, w, (s, s), pads).astype(jnp.float32))

        g_xla = jax.jit(jax.grad(f_xla, (0, 1)))
        g_tap = jax.jit(jax.grad(f_tap, (0, 1)))
        t_xla = bench(g_xla, (x, w))
        t_tap = bench(g_tap, (x, w))
        flops = 3 * 2 * B * (H // s) * (W // s) * k * k * C * Co  # fwd+dx+dw
        print(f"{label:26s} xla {t_xla*1e3:7.3f} ms  tap {t_tap*1e3:7.3f} ms "
              f" ratio {t_xla/t_tap:5.2f}x  ({flops/1e9:.1f} GF 3-pass)",
              flush=True)


if __name__ == "__main__":
    main()
