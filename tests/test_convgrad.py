"""Parity tests for the layout-preserving conv gradient
(ops/convgrad.py + nn/conv.py).

The forward must be bit-identical to ``flax.linen.Conv`` (it is the same
``lax.conv_general_dilated``); the weight gradient is the same
contraction computed as per-tap (B,H,W) matmuls — equal to autodiff up
to f32 accumulation order.  Reference counterpart: torch autograd
through ``nn.Conv2d`` in the trainers' hot loop
(train_file/trainer_DLC_GRU.py:212-213).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from stereoformer_tpu.nn.conv import Conv
from stereoformer_tpu.ops.convgrad import conv2d_tapgrad, resolve_padding


CASES = [
    # (kernel, stride, padding, C, Co, H, W)
    ((3, 3), 1, 1, 16, 24, 10, 14),
    ((3, 3), 2, 1, 16, 24, 10, 14),
    ((1, 1), 2, 0, 16, 24, 10, 14),
    ((1, 1), 1, 0, 16, 24, 10, 14),
    ((7, 7), 2, 3, 3, 8, 16, 16),      # RGB stem shape class
    ((1, 5), 1, "SAME", 12, 12, 9, 11),  # SepConvGRU shapes
    ((5, 1), 1, "SAME", 12, 12, 9, 11),
]


@pytest.mark.parametrize("k,s,pad,C,Co,H,W", CASES)
def test_conv_module_value_and_grad_parity(k, s, pad, C, Co, H, W):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    ref = nn.Conv(Co, k, strides=s, padding=pad)
    mine = Conv(Co, k, strides=s, padding=pad)
    v = ref.init(jax.random.PRNGKey(1), x)

    # identical parameter tree (checkpoint compatibility)
    assert jax.tree_util.tree_structure(
        v
    ) == jax.tree_util.tree_structure(mine.init(jax.random.PRNGKey(1), x))

    np.testing.assert_array_equal(
        np.asarray(ref.apply(v, x)), np.asarray(mine.apply(v, x))
    )

    def grads(mod):
        def f(params, xx):
            return jnp.sum(jnp.sin(mod.apply({"params": params}, xx)))

        return jax.grad(f, argnums=(0, 1))(v["params"], x)

    for a, b in zip(*(jax.tree.leaves(grads(m)) for m in (ref, mine))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_tapgrad_dw_forced_tap_matches_autodiff_stride2():
    """Force the tap dw (no auto routing) at a strided, asymmetric case."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 13, 17, 9).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, 9, 11).astype(np.float32))
    pads = resolve_padding("SAME", x.shape, (3, 3), (2, 2))

    def f_tap(x, w):
        return jnp.sum(jnp.cos(conv2d_tapgrad(x, w, (2, 2), pads)))

    def f_ref(x, w):
        return jnp.sum(jnp.cos(jax.lax.conv_general_dilated(
            x, w, (2, 2), pads, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )))

    for a, b in zip(jax.grad(f_tap, (0, 1))(x, w),
                    jax.grad(f_ref, (0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,C,Co,H,W", [
    ((3, 3), 16, 24, 10, 14),
    ((3, 3), 24, 24, 13, 30),   # aggregation shape class, H % tile != 0
    ((1, 1), 16, 32, 8, 16),
    ((1, 5), 16, 16, 9, 11),    # SepConvGRU separable taps
    ((5, 1), 16, 16, 9, 11),
])
def test_pallas_dwgrad_matches_autodiff(k, C, Co, H, W):
    """The fused Pallas dw kernel (interpret mode on CPU) must reproduce
    autodiff's weight gradient; dx/values are shared with the XLA form."""
    from stereoformer_tpu.ops.convgrad import conv2d_pallas_dwgrad

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(*k, C, Co).astype(np.float32))
    ph, pw = (k[0] - 1) // 2, (k[1] - 1) // 2
    pads = ((ph, ph), (pw, pw))

    def f_pal(x, w):
        return jnp.sum(jnp.cos(
            conv2d_pallas_dwgrad(x, w, (1, 1), pads, True)))

    def f_ref(x, w):
        return jnp.sum(jnp.cos(jax.lax.conv_general_dilated(
            x, w, (1, 1), pads, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )))

    np.testing.assert_allclose(float(f_pal(x, w)), float(f_ref(x, w)),
                               rtol=1e-6)
    for a, b in zip(jax.grad(f_pal, (0, 1))(x, w),
                    jax.grad(f_ref, (0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_auto_dw_routing_policy(monkeypatch):
    """Locks the measured shape-class routing: XLA autodiff everywhere by
    default on CPU; env overrides honoured; the Pallas form only ever
    offered to stride-1 symmetric-SAME C>=16 concrete-shape sites."""
    from stereoformer_tpu.nn.conv import _auto_dw

    p1 = ((1, 1), (1, 1))
    # default backend here is CPU -> everything XLA
    assert _auto_dw((4, 40, 80, 128), (3, 3), (1, 1), p1) == "xla"
    assert _auto_dw((2, 320, 720, 64), (3, 3), (1, 1), p1) == "xla"
    # env forces
    monkeypatch.setenv("STEREOFORMER_DW_IMPL", "tap")
    assert _auto_dw((4, 40, 80, 128), (3, 3), (1, 1), p1) == "tap"
    monkeypatch.setenv("STEREOFORMER_DW_IMPL", "pallas")
    # forced pallas is TPU-gated (the kernel's backward runs
    # interpret=False; off-TPU it would crash at grad time) — on this
    # CPU backend even an eligible site stays XLA
    assert _auto_dw((2, 320, 720, 64), (3, 3), (1, 1), p1) == "xla"
    # ineligible under forced pallas: stride 2, tiny C, asymmetric pad
    assert _auto_dw((2, 320, 720, 64), (3, 3), (2, 2), p1) == "xla"
    assert _auto_dw((2, 320, 720, 3), (3, 3), (1, 1), p1) == "xla"
    assert _auto_dw((2, 320, 720, 64), (3, 3), (1, 1),
                    ((0, 1), (1, 1))) == "xla"


def test_conv_bf16_compute_dtype():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    mod = Conv(24, (3, 3), padding=1, dtype=jnp.bfloat16)
    ref = nn.Conv(24, (3, 3), padding=1, dtype=jnp.bfloat16)
    v = ref.init(jax.random.PRNGKey(0), x)
    y_ref = ref.apply(v, x)
    y_new = mod.apply(v, x)
    assert y_new.dtype == y_ref.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_new, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    g = jax.grad(
        lambda p: jnp.sum(mod.apply({"params": p}, x).astype(jnp.float32))
    )(v["params"])
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(g))
