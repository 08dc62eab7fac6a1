"""Deformable conv op: zero-offset ≡ plain convolution (mirrors the
reference's own test strategy, deform/test.py:36-110), identity kernels,
and finite-difference gradcheck."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu import ops


def test_zero_offset_equals_plain_conv():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    B, H, W, C, Co, k = 2, 6, 7, 4, 5, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    w = rng.randn(Co, C, k, k).astype(np.float32)
    b = rng.randn(Co).astype(np.float32)

    want = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=1,
        padding=1,
    ).numpy()

    offsets = jnp.zeros((B, H, W, k * k, 2))
    mask = jnp.ones((B, H, W, k * k))
    # weight layout here: [K*C, Co], tap-major (ky, kx, cin)
    w_flat = jnp.asarray(w.transpose(2, 3, 1, 0).reshape(k * k * C, Co))
    got = ops.modulated_deform_conv(
        jnp.asarray(x), offsets, mask, w_flat, jnp.asarray(b)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_integer_offset_shift():
    """Identity center-tap kernel + integer offset = shifted image."""
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 5, 6, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    K = 9
    # weight: only center tap (k=4), identity over channels
    w = np.zeros((K * C, C), np.float32)
    for c in range(C):
        w[4 * C + c, c] = 1.0
    offsets = np.zeros((B, H, W, K, 2), np.float32)
    offsets[..., 4, 1] = 1.0  # center tap shifted +1 in x
    out = ops.modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offsets), jnp.ones((B, H, W, K)), jnp.asarray(w)
    )
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :-1], x[:, :, 1:], atol=1e-5
    )
    # out-of-bounds sample at last column -> 0 (zero padding)
    np.testing.assert_allclose(np.asarray(out)[:, :, -1], 0.0, atol=1e-6)


def test_fractional_offset_bilinear():
    x = np.zeros((1, 3, 4, 1), np.float32)
    x[0, 1, 1, 0] = 1.0
    x[0, 1, 2, 0] = 3.0
    y = jnp.array([[1.0]])
    xx = jnp.array([[1.25]])
    v = ops.bilinear_sample_2d(jnp.asarray(x), y, xx)
    np.testing.assert_allclose(float(v[0, 0, 0]), 0.75 * 1 + 0.25 * 3, atol=1e-6)


def test_deform_gradcheck_fd():
    """Finite-difference check of d(out)/d(offsets) and d(out)/d(x)."""
    rng = np.random.RandomState(2)
    B, H, W, C = 1, 4, 4, 2
    K = 9
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float64) * 0 + rng.rand(B, H, W, C))
    offs = jnp.asarray(rng.uniform(-0.4, 0.4, (B, H, W, K, 2)))
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (B, H, W, K)))
    w = jnp.asarray(rng.randn(K * C, 1))

    def f(x_, o_, m_):
        return jnp.sum(
            jnp.sin(ops.modulated_deform_conv(x_, o_, m_, w))
        )

    grads = jax.grad(f, argnums=(0, 1, 2))(x, offs, mask)
    eps = 1e-4
    for argnum, arr in [(0, x), (1, offs), (2, mask)]:
        flat = np.asarray(arr).ravel()
        idxs = rng.choice(flat.size, size=5, replace=False)
        for i in idxs:
            pert = flat.copy()
            pert[i] += eps
            args_p = [x, offs, mask]
            args_p[argnum] = jnp.asarray(pert.reshape(arr.shape))
            plus = float(f(*args_p))
            pert[i] -= 2 * eps
            args_m = [x, offs, mask]
            args_m[argnum] = jnp.asarray(pert.reshape(arr.shape))
            minus = float(f(*args_m))
            fd = (plus - minus) / (2 * eps)
            an = float(np.asarray(grads[argnum]).ravel()[i])
            assert abs(fd - an) < 1e-2, (argnum, i, fd, an)


def test_psroi_pool_uniform_feature():
    """On a constant feature map every bin pools to the constant."""
    feat = jnp.full((1, 16, 16, 4), 3.0)
    rois = jnp.array([[0, 2, 2, 9, 9]], jnp.float32)
    out = ops.deform_psroi_pool(feat, rois, None, pooled_size=4)
    assert out.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_psroi_pool_gradient_and_offsets():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    rois = jnp.array([[0, 1, 1, 10, 10], [1, 4, 4, 14, 12]], jnp.float32)
    offs = jnp.asarray(rng.randn(2, 3, 3, 2).astype(np.float32) * 0.5)

    def f(feat_, offs_):
        return jnp.sum(
            ops.deform_psroi_pool(feat_, rois, offs_, pooled_size=3) ** 2
        )

    g_feat, g_off = jax.grad(f, argnums=(0, 1))(feat, offs)
    assert bool(jnp.isfinite(g_feat).all()) and float(jnp.abs(g_feat).sum()) > 0
    assert bool(jnp.isfinite(g_off).all()) and float(jnp.abs(g_off).sum()) > 0
    # offsets shift the pooled values
    out0 = ops.deform_psroi_pool(feat, rois, jnp.zeros_like(offs), pooled_size=3)
    out1 = ops.deform_psroi_pool(feat, rois, offs, pooled_size=3)
    assert float(jnp.abs(out0 - out1).max()) > 1e-4


def test_psroi_pool_vertical_gradient_feature():
    """A feature that increases with y: lower bins pool larger values."""
    y = np.arange(16, dtype=np.float32)[:, None, None]
    feat = jnp.asarray(np.broadcast_to(y, (16, 16, 1))[None])
    rois = jnp.array([[0, 0, 0, 15, 15]], jnp.float32)
    out = np.asarray(ops.deform_psroi_pool(feat, rois, None, pooled_size=4))[0, :, :, 0]
    assert (np.diff(out.mean(axis=1)) > 0).all()


# --- windowed (gather-free) form and the Pallas fused kernel -----------------

def _rand_case(B=2, H=13, W=17, C=8, Cout=6, scale=1.8, seed=0):
    rng = np.random.RandomState(seed)
    K = 9
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    # offsets strictly inside the ±2 window, away from integers
    off = jnp.asarray(rng.rand(B, H, W, K, 2).astype(np.float32) * 2 * scale
                      - scale)
    mask = jnp.asarray(rng.rand(B, H, W, K).astype(np.float32))
    wgt = jnp.asarray(rng.randn(K * C, Cout).astype(np.float32) * 0.1)
    return x, off, mask, wgt


def test_windowed_matches_gather_value_and_grad():
    """Within the ±window the dense hat form equals the gather form exactly
    (module docstring deform.py; deviation only outside the window)."""
    x, off, mask, wgt = _rand_case()

    a = ops.modulated_deform_conv(x, off, mask, wgt)
    b = ops.modulated_deform_conv_windowed(x, off, mask, wgt, window=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def fa(*args):
        return jnp.sum(jnp.sin(ops.modulated_deform_conv(*args)))

    def fb(*args):
        return jnp.sum(jnp.sin(
            ops.modulated_deform_conv_windowed(*args, window=2)))

    ga = jax.grad(fa, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
    gb = jax.grad(fb, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=5e-5)


def test_windowed_dilation_and_padding():
    x, off, mask, wgt = _rand_case()
    a = ops.modulated_deform_conv(x, off, mask, wgt, padding=2, dilation=2)
    b = ops.modulated_deform_conv_windowed(
        x, off, mask, wgt, padding=2, dilation=2, window=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_windowed_clamps_large_offsets():
    """|offset| > window saturates at the window edge — the documented
    deviation; the value must equal the gather form fed clamped offsets."""
    x, off, mask, wgt = _rand_case(scale=5.0)
    b = ops.modulated_deform_conv_windowed(x, off, mask, wgt, window=2)
    a = ops.modulated_deform_conv(x, jnp.clip(off, -2, 2), mask, wgt)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pallas_deform_fused_matches_windowed():
    """Interpret-mode parity of the fused kernel (value + all grads) against
    the windowed XLA form, including uneven row tiles and dilation."""
    from stereoformer_tpu.ops.pallas.deform_sample import deform_conv_fused

    x, off, mask, wgt = _rand_case()
    a = ops.modulated_deform_conv_windowed(x, off, mask, wgt, window=2)
    b = deform_conv_fused(x, off, mask, wgt, 3, 1, 1, 2, 16, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def fa(*args):
        return jnp.sum(jnp.sin(
            ops.modulated_deform_conv_windowed(*args, window=2)))

    def fb(*args):
        return jnp.sum(jnp.sin(
            deform_conv_fused(*args, 3, 1, 1, 2, 16, True)))

    ga = jax.grad(fa, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
    gb = jax.grad(fb, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=5e-5)

    # dilation=2 + block_rows that do not divide Ho
    c = deform_conv_fused(x, off, mask, wgt, 3, 2, 2, 2, 8, True)
    cw = ops.modulated_deform_conv_windowed(
        x, off, mask, wgt, padding=2, dilation=2, window=2)
    np.testing.assert_allclose(np.asarray(c), np.asarray(cw), atol=2e-5)


def test_deform_conv_module_windowed_default():
    """DeformConv(window=2) at zero init equals the exact path (offsets 0)."""
    from stereoformer_tpu.nn import DeformConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
    m = DeformConv(6)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    y0 = DeformConv(6, window=None).apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), atol=1e-5)


# ---- module-wrapper tail (deform/modules/*.py — nn/deform.py) -------------


def _plain_conv(x, weight, bias, k=3, padding=1):
    """Reference plain conv with the deform weight layout [K*C, Cout]."""
    C = x.shape[-1]
    w = weight.reshape(k, k, C, -1)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if bias is None else y + bias


def test_modulated_deform_conv_module_explicit_inputs():
    """Explicit-offset DCNv2 module: zero offsets + unit mask == plain conv;
    matches the op for random offsets (modulated_deform_conv.py:14-66)."""
    from stereoformer_tpu.nn import ModulatedDeformConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 14, 8).astype(np.float32))
    m = ModulatedDeformConv(6)
    off0 = jnp.zeros((2, 10, 14, 9, 2))
    mask1 = jnp.ones((2, 10, 14, 9))
    v = m.init(jax.random.PRNGKey(0), x, off0, mask1)
    y0 = m.apply(v, x, off0, mask1)
    ref = _plain_conv(x, v["params"]["weight"], v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(ref), atol=1e-5)

    off = jnp.asarray(rng.randn(2, 10, 14, 9, 2).astype(np.float32))
    mask = jax.nn.sigmoid(jnp.asarray(rng.randn(2, 10, 14, 9), jnp.float32))
    y = m.apply(v, x, off, mask)
    y_op = ops.modulated_deform_conv(
        x, off, mask, v["params"]["weight"], v["params"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_op), atol=1e-5)


def test_modulated_deform_normal_second_feature_drives_offsets():
    """ModulatedDeformNormal: at zero init == 0.5x plain conv of the INPUT
    feature (sigmoid(0) mask) independent of the normal feature; the
    offset gradient flows to the normal feature, not the input
    (modulated_deform_conv.py:105-151)."""
    from stereoformer_tpu.nn import ModulatedDeformNormal

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 14, 8).astype(np.float32))
    nf = jnp.asarray(rng.randn(2, 10, 14, 4).astype(np.float32))
    m = ModulatedDeformNormal(6)
    v = m.init(jax.random.PRNGKey(0), x, nf)
    y = m.apply(v, x, nf)
    ref = 0.5 * _plain_conv(x, v["params"]["weight"], None) \
        + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    # changing the normal feature at zero init changes nothing...
    y2 = m.apply(v, x, nf * 3.0 + 1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    # ...but the offset conv's gradient is driven by the normal feature:
    g = jax.grad(
        lambda p: jnp.sum(m.apply({"params": p}, x, nf) ** 2)
    )(v["params"])
    assert float(jnp.max(jnp.abs(g["offset_mask"]["kernel"]))) > 0.0


def test_deform_conv_v1_pack_zero_init_is_plain_conv():
    """v1 Pack at zero init: offsets 0, NO mask -> exactly a plain conv
    (deform_conv.py:66-99), unlike the modulated pack's 0.5 factor."""
    from stereoformer_tpu.nn import DeformConvV1, DeformConvV1Pack

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 11, 8).astype(np.float32))
    m = DeformConvV1Pack(6)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    p = v["params"]["deform"]
    ref = _plain_conv(x, p["weight"], p["bias"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    # explicit-offset v1 module: integer offset (+1 row) == shifted conv
    me = DeformConvV1(6)
    ve = {"params": p}
    off = jnp.zeros((2, 9, 11, 9, 2)).at[..., 0].set(1.0)
    ys = me.apply(ve, x, off)
    x_dn = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
    ref_s = _plain_conv(x_dn, p["weight"], p["bias"])
    # interior rows only (boundary taps sample the zero pad differently)
    np.testing.assert_allclose(
        np.asarray(ys[:, 1:-2]), np.asarray(ref_s[:, 1:-2]), atol=1e-5
    )


def test_deform_roi_pooling_pack_zero_init_is_half_roialign():
    """RoI Pack at zero init: offsets 0, mask 0.5 -> 0.5x plain PS-RoI
    pooling (deform_psroi_pooling.py:50-130); no_trans skips the head."""
    from stereoformer_tpu.nn import DeformRoIPooling, DeformRoIPoolingPack
    from stereoformer_tpu.ops.deform_roi import deform_psroi_pool

    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 16, 20, 8).astype(np.float32))
    rois = jnp.asarray(
        [[0, 2, 3, 12, 11], [1, 0, 0, 19, 15]], jnp.float32
    )
    m = DeformRoIPoolingPack(pooled_size=5, trans_std=0.1)
    v = m.init(jax.random.PRNGKey(0), feats, rois)
    y = m.apply(v, feats, rois)
    align = deform_psroi_pool(feats, rois, None, pooled_size=5,
                              trans_std=0.1)
    np.testing.assert_allclose(np.asarray(y), 0.5 * np.asarray(align),
                               atol=1e-5)
    assert y.shape == (2, 5, 5, 8)

    # thin module == op (explicit offsets)
    off = jnp.asarray(rng.randn(2, 5, 5, 2).astype(np.float32))
    thin = DeformRoIPooling(pooled_size=5, trans_std=0.1)
    yt = thin.apply({}, feats, rois, off)
    y_op = deform_psroi_pool(feats, rois, off, pooled_size=5, trans_std=0.1)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(y_op), atol=1e-6)
