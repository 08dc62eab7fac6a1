"""Fused stride-1 conv2d Pallas kernel vs the XLA conv (interpret mode).

Covers the RAFT encoder shapes the kernel targets (reference
models/IterativeLocalCostVolume/extractor/extractor.py:140-169): 3x3
same-channel residual-block convs with fused bias/residual/ReLU, plus
odd-channel and 1x1 edge cases, in value and gradient.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu.ops.pallas.conv2d import conv2d_fused, _reference


CASES = [
    # kh, kw, C, Co, H, W, relu, residual
    (3, 3, 64, 64, 24, 40, True, True),
    (3, 3, 64, 64, 24, 40, True, False),
    (7, 7, 3, 64, 24, 40, True, False),
    (3, 3, 16, 32, 19, 40, False, False),   # H not a tile multiple
    (1, 1, 64, 64, 24, 40, True, False),
]


def _case(kh, kw, c, co, h, w, res, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    wt = jnp.asarray(0.1 * rng.randn(kh, kw, c, co).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(co).astype(np.float32))
    r = jnp.asarray(rng.randn(2, h, w, co).astype(np.float32)) if res else None
    return x, wt, b, r


@pytest.mark.parametrize("kh,kw,c,co,h,w,relu,res", CASES)
def test_conv2d_fused_value(kh, kw, c, co, h, w, relu, res):
    x, wt, b, r = _case(kh, kw, c, co, h, w, res)
    got = conv2d_fused(x, wt, b, r, relu, 8, True)
    want = _reference(x, wt, b, r, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("kh,kw,c,co,h,w,relu,res", CASES)
def test_conv2d_fused_grads(kh, kw, c, co, h, w, relu, res):
    x, wt, b, r = _case(kh, kw, c, co, h, w, res, seed=1)

    def f_ker(x, wt, b):
        return jnp.sum(jnp.sin(conv2d_fused(x, wt, b, r, relu, 8, True)))

    def f_ref(x, wt, b):
        return jnp.sum(jnp.sin(_reference(x, wt, b, r, relu)))

    ga = jax.grad(f_ker, argnums=(0, 1, 2))(x, wt, b)
    gb = jax.grad(f_ref, argnums=(0, 1, 2))(x, wt, b)
    for a, want in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=2e-4)


def test_conv2d_fused_residual_grad_flows():
    x, wt, b, r = _case(3, 3, 16, 16, 16, 24, True, seed=2)

    def f(r):
        return jnp.sum(conv2d_fused(x, wt, b, r, True, 8, True))

    def g(r):
        return jnp.sum(_reference(x, wt, b, r, True))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(r)), np.asarray(jax.grad(g)(r)), atol=2e-4
    )


def test_conv2d_fused_bf16_grads_mixed_dtype_cotangent():
    """bf16 params + f32 loss: the VJP must survive the f32 cotangents
    that conv_general_dilated's transpose rejects when combined with
    preferred_element_type (regression: TPU train step with dtype=bf16)."""
    x, wt, b, _ = _case(3, 3, 16, 16, 16, 24, False)
    x, wt, b = x.astype(jnp.bfloat16), wt.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

    def f(x, wt, b):
        y = conv2d_fused(x, wt, b, None, True, 8, True)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    grads = jax.grad(f, argnums=(0, 1, 2))(x, wt, b)
    for g, ref in zip(grads, (x, wt, b)):
        assert g.dtype == ref.dtype
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_conv2d_fused_matches_flax_conv_layout():
    """HWIO weights + NHWC activations == flax nn.Conv semantics."""
    import flax.linen as nn

    x, wt, b, _ = _case(3, 3, 8, 12, 16, 24, False)
    conv = nn.Conv(12, (3, 3), padding="SAME")
    params = {"params": {"kernel": wt, "bias": b}}
    want = conv.apply(params, x)
    got = conv2d_fused(x, wt, b, None, False, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _prologue_case(seed=5):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 19, 40, 16).astype(np.float32))
    wt = jnp.asarray(0.1 * rng.randn(3, 3, 16, 24).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(24).astype(np.float32))
    s = jnp.asarray((0.5 + rng.rand(2, 16)).astype(np.float32))
    t = jnp.asarray(0.3 * rng.randn(2, 16).astype(np.float32))
    return x, wt, b, s, t


@pytest.mark.parametrize("relu", [False, True])
def test_conv2d_fused_prologue_value(relu):
    from stereoformer_tpu.ops.pallas.conv2d import (
        _prologue_ref, conv2d_fused_prologue,
    )

    x, wt, b, s, t = _prologue_case()
    got = conv2d_fused_prologue(x, wt, b, s, t, relu, 8, True)
    want = _prologue_ref(x, wt, b, s, t, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_conv2d_fused_prologue_grads(relu):
    from stereoformer_tpu.ops.pallas.conv2d import (
        _prologue_ref, conv2d_fused_prologue,
    )

    x, wt, b, s, t = _prologue_case(seed=6)

    def f_ker(*a):
        return jnp.sum(jnp.sin(conv2d_fused_prologue(*a, relu, 8, True)))

    def f_ref(*a):
        return jnp.sum(jnp.sin(_prologue_ref(*a, relu)))

    ga = jax.grad(f_ker, argnums=(0, 1, 2, 3, 4))(x, wt, b, s, t)
    gb = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, wt, b, s, t)
    for a, want in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(want), atol=2e-4, rtol=1e-4
        )


@pytest.mark.parametrize("relu", [False, True])
def test_conv2d_fused_s2(relu):
    from stereoformer_tpu.ops.pallas.conv2d import (
        _reference_s2, conv2d_fused_s2,
    )

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 20, 48, 16).astype(np.float32))
    wt = jnp.asarray(0.1 * rng.randn(3, 3, 16, 24).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(24).astype(np.float32))
    got = conv2d_fused_s2(x, wt, b, relu, 8, True)
    want = _reference_s2(x, wt, b, relu)
    assert got.shape == want.shape == (2, 10, 24, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def f(x, wt, b):
        return jnp.sum(jnp.sin(conv2d_fused_s2(x, wt, b, relu, 8, True)))

    def fr(x, wt, b):
        return jnp.sum(jnp.sin(_reference_s2(x, wt, b, relu)))

    ga = jax.grad(f, argnums=(0, 1, 2))(x, wt, b)
    gb = jax.grad(fr, argnums=(0, 1, 2))(x, wt, b)
    for a, want in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=2e-4)


def test_conv2d_fused_shape_fuzz():
    """Randomised shape sweep (interpret mode): odd widths, non-tile
    heights, C not a lane multiple, kh in {1,3}, with/without relu."""
    rng = np.random.RandomState(11)
    for trial in range(10):
        kh = int(rng.choice([1, 3]))
        c = int(rng.choice([3, 5, 16, 48, 64]))
        co = int(rng.choice([8, 24, 64]))
        h = int(rng.randint(3, 30))
        w = int(rng.randint(3, 50))
        relu = bool(rng.rand() < 0.5)
        th = int(rng.choice([4, 8, 16]))
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        wt = jnp.asarray(0.1 * rng.randn(kh, kh, c, co).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(co).astype(np.float32))
        got = conv2d_fused(x, wt, b, None, relu, th, True)
        want = _reference(x, wt, b, None, relu)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5,
            err_msg=f"trial {trial}: kh={kh} c={c} co={co} h={h} w={w} "
                    f"relu={relu} th={th}",
        )


def test_conv2d_fused_stats_parity():
    """The kernel-emitted output moments (Σy, Σy²) must match the
    reference conv's moments — incl. the H-tail tile (rows past H are
    masked out of the sums) and the prologue variant."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stereoformer_tpu.ops.pallas.conv2d import (
        _prologue_ref,
        _reference,
        conv2d_fused_prologue_stats,
        conv2d_fused_stats,
    )

    rng = np.random.RandomState(0)
    for H, W, C, Co, relu in ((19, 40, 24, 32, False), (16, 24, 16, 16, True)):
        x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, C, Co) * 0.2).astype(np.float32))
        b = jnp.asarray(rng.randn(Co).astype(np.float32))
        ref = _reference(x, w, b, None, relu)
        y, s1, s2 = conv2d_fused_stats(x, w, b, relu, tile_h=8,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        rf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(s1), rf.sum(axis=(1, 2)),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(s2), (rf ** 2).sum(axis=(1, 2)),
                                   rtol=1e-4, atol=1e-3)

    x = jnp.asarray(rng.randn(2, 17, 32, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 16, 16) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    s = jnp.asarray(rng.rand(2, 16).astype(np.float32) + 0.5)
    t = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    ref = _prologue_ref(x, w, b, s, t, False)
    y, s1, s2 = conv2d_fused_prologue_stats(x, w, b, s, t, False,
                                            tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    rf = np.asarray(ref, np.float64)
    np.testing.assert_allclose(np.asarray(s1), rf.sum(axis=(1, 2)),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (rf ** 2).sum(axis=(1, 2)),
                               rtol=1e-4, atol=1e-3)


def test_conv2d_fused_stats_grad_parity():
    """The stats entries' custom VJP: gradients of a loss using (y, Σy,
    Σy²) must match autodiff of the reference formulation — the moment
    cotangents fold into the output cotangent (g = ȳ + s̄1 + 2y·s̄2)
    before the standard backward.  Covers relu on/off and the prologue
    variant."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stereoformer_tpu.ops.pallas.conv2d import (
        _prologue_ref,
        _reference,
        conv2d_fused_prologue_stats,
        conv2d_fused_stats,
    )

    rng = np.random.RandomState(1)
    B, H, W, C, Co = 2, 13, 24, 16, 16
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, C, Co) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.randn(Co).astype(np.float32))
    c1 = jnp.asarray(rng.randn(B, Co).astype(np.float32))
    c2 = jnp.asarray(rng.randn(B, Co).astype(np.float32))

    for relu in (False, True):
        def loss_fused(x_, w_, b_):
            y, s1, s2 = conv2d_fused_stats(x_, w_, b_, relu, 8, True)
            return (jnp.sum(jnp.sin(y)) + jnp.sum(s1 * c1)
                    + jnp.sum(s2 * c2))

        def loss_ref(x_, w_, b_):
            y = _reference(x_, w_, b_, None, relu)
            return (jnp.sum(jnp.sin(y)) + jnp.sum(jnp.sum(y, (1, 2)) * c1)
                    + jnp.sum(jnp.sum(jnp.square(y), (1, 2)) * c2))

        gf = jax.grad(loss_fused, (0, 1, 2))(x, w, b)
        gr = jax.grad(loss_ref, (0, 1, 2))(x, w, b)
        for a, r in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-3)

    s = jnp.asarray((rng.rand(B, C) + 0.5).astype(np.float32))
    t = jnp.asarray(rng.randn(B, C).astype(np.float32))

    def ploss_fused(x_, w_, b_, s_, t_):
        y, s1, s2 = conv2d_fused_prologue_stats(x_, w_, b_, s_, t_,
                                                False, 8, True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

    def ploss_ref(x_, w_, b_, s_, t_):
        y = _prologue_ref(x_, w_, b_, s_, t_, False)
        return (jnp.sum(jnp.sin(y)) + jnp.sum(jnp.sum(y, (1, 2)) * c1)
                + jnp.sum(jnp.sum(jnp.square(y), (1, 2)) * c2))

    gf = jax.grad(ploss_fused, (0, 1, 2, 3, 4))(x, w, b, s, t)
    gr = jax.grad(ploss_ref, (0, 1, 2, 3, 4))(x, w, b, s, t)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-3)
