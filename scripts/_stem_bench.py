"""Isolated A/B of 7×7 RGB stem-conv formulations on TPU.

The stem is the largest single op in both families' eval profiles
(LowCNN 7×7/s2: 3.0 ms of a 29 ms step; RAFT fnet/cnet 7×7/s1: 8 ms of
a 118 ms step) and runs at 7-9 TF/s — XLA's Cin=3 emitter
(InputFeaturePackedInSublanes) can only part-fill the MXU.  Round 2
measured plain space-to-depth + XLA conv 19% SLOWER; this measures the
matmul-reformulations:

  conv      — lax.conv_general_dilated baseline
  im2col    — 49 shifted (strided for s2) slices concat'd to K=147,
              one dense einsum
  s2d+im2col— space-to-depth first (dense 4×4×12 taps, K=192), then
              16 dense slices + einsum

All validated against the conv baseline before timing.  Pipelined
dispatch (CLAUDE.md).  usage: python scripts/_stem_bench.py
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

DT = jnp.bfloat16


def conv_ref(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col(x, w, stride):
    B, H, W, C = x.shape
    Ho, Wo = H // stride, W // stride
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cols = []
    for dy in range(7):
        for dx in range(7):
            cols.append(xp[:, dy:dy + stride * (Ho - 1) + 1:stride,
                           dx:dx + stride * (Wo - 1) + 1:stride, :])
    patches = jnp.concatenate(cols, axis=-1)            # [B,Ho,Wo,147]
    wr = w.reshape(49 * C, -1)
    y = jnp.einsum("bhwk,kf->bhwf", patches, wr,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def s2d_im2col(x, w, stride):
    assert stride == 2
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))   # rows 0..H+7
    Hz, Wz = xp.shape[1] // 2, xp.shape[2] // 2
    # phase-major s2d: z[b,i,j,(p,q,c)] = xp[b,2i+p,2j+q,c]
    z = xp.reshape(B, Hz, 2, Wz, 2, C).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(B, Hz, Wz, 4 * C)                      # [B,Hz,Wz,12]
    cols = []
    for a in range(4):
        for bq in range(4):
            cols.append(z[:, a:a + Ho, bq:bq + Wo, :])
    patches = jnp.concatenate(cols, axis=-1)            # [B,Ho,Wo,192]
    # kernel reorder: W'[(a,bq),(p,q,c)] = w[2a+p, 2bq+q, c] (zero pad
    # dy=7 row/col)
    wp = jnp.zeros((8, 8) + w.shape[2:], w.dtype).at[:7, :7].set(w)
    wr = wp.reshape(4, 2, 4, 2, C, -1).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(16, 4 * C, -1).reshape(16 * 4 * C, -1)
    y = jnp.einsum("bhwk,kf->bhwf", patches, wr,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def bench(name, fn, args, flops):
    f = jax.jit(fn)
    y = f(*args)
    float(jnp.sum(y.astype(jnp.float32)))
    reps = 30
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(reps)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:12s} {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)
    return np.asarray(outs[-1].astype(jnp.float32)), dt


for label, B, H, W, stride in (
    ("LowCNN stem s2, B=8 @ 576x960", 8, 576, 960, 2),
    ("RAFT fnet stem s1, B=4 @ 576x960", 4, 576, 960, 1),
):
    print(f"{label}:")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)).astype(DT)
    w = jnp.asarray((rng.randn(7, 7, 3, 64) * 0.05).astype(np.float32)
                    ).astype(DT)
    Ho, Wo = H // stride, W // stride
    flops = 2 * B * Ho * Wo * 64 * 3 * 49
    ref, _ = bench("conv", lambda a, b: conv_ref(a, b, stride), (x, w), flops)
    got, _ = bench("im2col", lambda a, b: im2col(a, b, stride), (x, w), flops)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    print(f"    im2col rel err {err:.2e}")
    assert err < 2e-2, err
    if stride == 2:
        got, _ = bench("s2d+im2col", lambda a, b: s2d_im2col(a, b, stride), (x, w), flops)
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
        print(f"    s2d+im2col rel err {err:.2e}")
        assert err < 2e-2, err
