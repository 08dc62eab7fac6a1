"""TPU bench: Pallas fused deform kernel vs XLA windowed vs XLA gather."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from stereoformer_tpu.utils import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp
from stereoformer_tpu.ops import (modulated_deform_conv,
                                  modulated_deform_conv_windowed)
from stereoformer_tpu.ops.pallas.deform_sample import deform_conv_fused


def run(name, fn, args, reps=50):
    out = fn(*args); out.block_until_ready(); float(jnp.sum(out))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    float(jnp.sum(outs[-1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return out


def bench(B, H, W, C, Cout, block_rows=16):
    rng = np.random.RandomState(0)
    K = 9
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray(0.5 * rng.randn(B, H, W, K, 2).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, K).astype(np.float32))
    wgt = jnp.asarray(rng.randn(K * C, Cout).astype(np.float32) * 0.05)
    hdr = f"B={B} {H}x{W} C={C}->{Cout}"
    a = run(f"pallas  {hdr}", jax.jit(lambda *a: deform_conv_fused(*a, 3, 1, 1, 2, block_rows)), (x, off, mask, wgt))
    b = run(f"window  {hdr}", jax.jit(lambda x,o,m,w: modulated_deform_conv_windowed(x,o,m,w,None,window=2)), (x, off, mask, wgt))
    print(f"  value parity pallas vs window: {float(jnp.abs(a-b).max()):.2e}", flush=True)


if __name__ == "__main__":
    bench(4, 72, 120, 64, 64)
    bench(4, 144, 240, 32, 128)
