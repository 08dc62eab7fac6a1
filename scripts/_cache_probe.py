"""Probe: does the persistent XLA compilation cache work over the axon
remote-TPU transport?  Run twice; compare compile wall times."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

x = jnp.asarray(np.random.RandomState(0).randn(8, 128, 256, 64).astype(np.float32))
w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 64, 128).astype(np.float32))


@jax.jit
def f(x, w):
    y = x
    for _ in range(6):
        y = jax.nn.relu(
            jax.lax.conv_general_dilated(
                y, w[:, :, : y.shape[-1], : 64 + y.shape[-1] % 64],
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return jnp.sum(y)


t0 = time.perf_counter()
v = float(f(x, w))
t1 = time.perf_counter()
print(f"devices={jax.devices()} compile+run={t1-t0:.2f}s value={v:.3e}")
