"""Time the XLA gather-based modulated_deform_conv at model shapes (TPU).

Shapes: LearnedBounds DeformBlock at 1/8 of 576x960 -> 72x120, C=64
(nn/update.py:206); also the residual refiner at 1/4 (residual.py:102).
"""
import time

import numpy as np

from stereoformer_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from stereoformer_tpu.ops import modulated_deform_conv


def bench(B, H, W, C, Cout, reps=50):
    rng = np.random.RandomState(0)
    K = 9
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray(0.5 * rng.randn(B, H, W, K, 2).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, K).astype(np.float32))
    wgt = jnp.asarray(rng.randn(K * C, Cout).astype(np.float32) * 0.05)

    fn = jax.jit(lambda x, o, m, w: jnp.sum(
        modulated_deform_conv(x, o, m, w)))
    float(fn(x, off, mask, wgt))
    float(fn(x, off, mask, wgt))
    t0 = time.perf_counter()
    outs = [fn(x, off, mask, wgt) for _ in range(reps)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"XLA deform B={B} {H}x{W} C={C}->{Cout}: {dt*1e3:.3f} ms")


def bench_windowed(B, H, W, C, Cout, window=2, reps=50):
    import jax
    import jax.numpy as jnp
    from stereoformer_tpu.ops import modulated_deform_conv_windowed
    rng = np.random.RandomState(0)
    K = 9
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray(0.5 * rng.randn(B, H, W, K, 2).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, K).astype(np.float32))
    wgt = jnp.asarray(rng.randn(K * C, Cout).astype(np.float32) * 0.05)
    fn = jax.jit(lambda x, o, m, w: jnp.sum(
        modulated_deform_conv_windowed(x, o, m, w, window=window)))
    float(fn(x, off, mask, wgt))
    float(fn(x, off, mask, wgt))
    t0 = time.perf_counter()
    outs = [fn(x, off, mask, wgt) for _ in range(reps)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"XLA windowed(R={window}) B={B} {H}x{W} C={C}->{Cout}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    bench(4, 72, 120, 64, 64)
    bench(4, 144, 240, 32, 128)
    bench_windowed(4, 72, 120, 64, 64)
    bench_windowed(4, 144, 240, 32, 128)
