"""Probe: does Mosaic lower an arbitrary-range sublane gather
(jnp.take_along_axis on a VMEM [HW, C] block with per-row indices)?

Run on TPU: python scripts/_gather_probe.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW, C, P = 8640, 64, 1152


def kernel(img_ref, idx_ref, out_ref):
    img = img_ref[:]                      # [HW, C]
    idx = idx_ref[:]                      # [HW, C] int32 (same per row here)
    out_ref[:] = jnp.take_along_axis(img, idx, axis=0)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(HW, C).astype(np.float32))
    # arbitrary-range row indices, constant across the row (per-column
    # gather semantics of tpu.dynamic_gather dim 0)
    rows = rng.randint(0, HW, size=(HW, 1)).astype(np.int32)
    idx = jnp.asarray(np.broadcast_to(rows, (HW, C)).copy())
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((HW, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, idx)
    want = np.asarray(img)[rows[:, 0]]
    np.testing.assert_allclose(np.asarray(out), want)
    print("GATHER_PROBE_OK", out.shape, jax.devices())


if __name__ == "__main__":
    main()
