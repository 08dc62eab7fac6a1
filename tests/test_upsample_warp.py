"""Convex upsample vs the torch unfold reference; bilinear resize vs
torch.nn.functional.interpolate; warp semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu import ops


def torch_upsample_convex8(disp_nchw, mask_nchw):
    """Verbatim-semantics reference (models/utils/upsample.py:22-38)."""
    import torch
    import torch.nn.functional as F

    disp = torch.from_numpy(disp_nchw)
    mask = torch.from_numpy(mask_nchw)
    N, _, H, W = disp.shape
    mask = mask.view(N, 1, 9, 8, 8, H, W)
    mask = torch.softmax(mask, dim=2)
    up = F.unfold(8 * disp, [3, 3], padding=1)
    up = up.view(N, 1, 9, 1, 1, H, W)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(N, 1, 8 * H, 8 * W).numpy()


def _upsample_convex_plain(disp, mask, f):
    """Plain-JAX 6-D softmax/einsum formulation (the pre-custom-VJP op)
    — gradient oracle for the lane-sliced custom VJP."""
    B, H, W, _ = disp.shape
    m = mask.reshape(B, H, W, 9, f, f)
    m = jax.nn.softmax(m.astype(jnp.float32), axis=3)
    nbr = ops.upsample.neighborhood9(float(f) * disp)[..., 0]
    up = jnp.einsum("bhwkyx,bhwk->bhwyx", m, nbr)
    up = jnp.transpose(up, (0, 1, 3, 2, 4))
    return up.reshape(B, f * H, f * W, 1)


@pytest.mark.parametrize("f", [4, 8])
def test_upsample_convex_grad_parity(f):
    rng = np.random.RandomState(3)
    disp = jnp.asarray(rng.rand(2, 5, 7, 1).astype(np.float32) * 20)
    mask = jnp.asarray(rng.randn(2, 5, 7, 9 * f * f).astype(np.float32))

    def loss_new(d, m):
        return jnp.sum(jnp.sin(ops.upsample_convex(d, m, f)))

    def loss_ref(d, m):
        return jnp.sum(jnp.sin(_upsample_convex_plain(d, m, f)))

    ga = jax.grad(loss_new, argnums=(0, 1))(disp, mask)
    gb = jax.grad(loss_ref, argnums=(0, 1))(disp, mask)
    for a, want in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   atol=2e-4, rtol=1e-3)


def test_upsample_convex8_matches_torch():
    pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    disp = rng.rand(2, 1, 5, 7).astype(np.float32) * 20
    mask = rng.randn(2, 9 * 64, 5, 7).astype(np.float32)
    want = torch_upsample_convex8(disp, mask)
    got = ops.upsample_convex8(
        jnp.asarray(disp.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_upsample_simple8_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    disp = rng.rand(1, 1, 4, 6).astype(np.float32) * 10
    want = (
        8 * F.interpolate(torch.from_numpy(disp), size=(32, 48), mode="bilinear", align_corners=True)
    ).numpy()
    got = ops.upsample_simple8(jnp.asarray(disp.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_resize_bilinear_halfpixel_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    img = rng.rand(2, 3, 9, 13).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), size=(5, 7), mode="bilinear", align_corners=False).numpy()
    got = ops.resize_bilinear(jnp.asarray(img.transpose(0, 2, 3, 1)), (5, 7), align_corners=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_scale_disp_scales_values():
    disp = jnp.ones((1, 4, 8, 1)) * 5.0
    out = ops.scale_disp(disp, (8, 16))
    assert out.shape == (1, 8, 16, 1)
    np.testing.assert_allclose(np.asarray(out), 10.0, atol=1e-5)


def test_disp_warp_integer_shift():
    """Integer disparity d shifts the image right by d columns."""
    rng = np.random.RandomState(3)
    img = rng.rand(1, 4, 10, 3).astype(np.float32)
    disp = jnp.full((1, 4, 10, 1), 2.0)
    warped, valid = ops.disp_warp(jnp.asarray(img), disp)
    np.testing.assert_allclose(np.asarray(warped)[:, :, 2:], img[:, :, :-2], atol=1e-6)
    v = np.asarray(valid)
    assert (v[:, :, 2:] == 1).all()
    assert (v[:, :, :2] == 0).all()


def test_disp_warp_zero_disp_identity():
    rng = np.random.RandomState(4)
    img = rng.rand(1, 3, 8, 2).astype(np.float32)
    warped, valid = ops.disp_warp(jnp.asarray(img), jnp.zeros((1, 3, 8, 1)))
    np.testing.assert_allclose(np.asarray(warped), img, atol=1e-6)
    assert (np.asarray(valid) == 1).all()


def test_corr1d_pyramid_and_lookup():
    rng = np.random.RandomState(5)
    f1 = jnp.asarray(rng.randn(1, 3, 16, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 3, 16, 8).astype(np.float32))
    corr = ops.allpairs_corr1d(f1, f2)
    assert corr.shape == (1, 3, 16, 16)
    want = (np.asarray(f1)[0, 1, 4] * np.asarray(f2)[0, 1, 9]).sum() / np.sqrt(8)
    np.testing.assert_allclose(np.asarray(corr)[0, 1, 4, 9], want, rtol=1e-5)
    pyr = ops.corr_pyramid(corr, 4)
    assert [p.shape[-1] for p in pyr] == [16, 8, 4, 2]
    np.testing.assert_allclose(
        np.asarray(pyr[1])[..., 0], np.asarray(corr)[..., :2].mean(-1), atol=1e-6
    )
    coords = jnp.full((1, 3, 16), 5.0)
    feat = ops.corr_lookup(pyr, coords, radius=4)
    assert feat.shape == (1, 3, 16, 4 * 9)
    # level-0 center tap == corr at w2=5
    np.testing.assert_allclose(
        np.asarray(feat)[..., 4], np.asarray(corr)[..., 5], atol=1e-5
    )


def test_onehot_window_sampler_matches_gather():
    """The gather-free windowed sampler must match the gather reference,
    including out-of-range zero padding and fractional coords."""
    from stereoformer_tpu.ops.corr1d import _sample_last, _sample_last_gather

    rng = np.random.RandomState(7)
    corr = jnp.asarray(rng.randn(2, 3, 10, 32).astype(np.float32))
    r = 4
    offsets = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # centres incl. negatives, > W2, integers, fractions (one per pixel)
    centres = jnp.asarray(
        np.stack([
            rng.uniform(-6, 38, (2, 3)),
            np.zeros((2, 3)), np.full((2, 3), 31.0),
            rng.uniform(0, 31, (2, 3)),
            np.full((2, 3), 15.0),
            rng.uniform(-6, 38, (2, 3)),
            rng.uniform(-6, 38, (2, 3)),
            rng.uniform(-6, 38, (2, 3)),
            rng.uniform(-6, 38, (2, 3)),
            rng.uniform(-6, 38, (2, 3)),
        ], axis=-1).astype(np.float32)
    )  # [2, 3, 10] — one centre per corr row
    c = centres[..., None] + offsets
    want = _sample_last_gather(corr, c)
    got = _sample_last(corr, c, radius=r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_onehot_window_grads_match():
    from stereoformer_tpu.ops.corr1d import _sample_last, _sample_last_gather

    rng = np.random.RandomState(8)
    corr = jnp.asarray(rng.randn(1, 2, 4, 16).astype(np.float32))
    centres = jnp.asarray(rng.uniform(0, 15, (1, 2, 4)).astype(np.float32))
    r = 2
    offsets = jnp.arange(-r, r + 1, dtype=jnp.float32)

    def f_gather(corr_, c_):
        c = c_[..., None] + offsets
        return jnp.sum(jnp.sin(_sample_last_gather(corr_, c)))

    def f_onehot(corr_, c_):
        c = c_[..., None] + offsets
        return jnp.sum(jnp.sin(_sample_last(corr_, c, radius=r)))

    ga = jax.grad(f_gather, argnums=(0, 1))(corr, centres)
    gb = jax.grad(f_onehot, argnums=(0, 1))(corr, centres)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_blocked_corr_lookup_bit_equal():
    """The blocked two-stage lookup (ops.corr_block_cache) is pure
    selection — values AND gradients must be BIT-equal to the flat
    one-hot path, including out-of-range zeros and integer centres."""
    rng = np.random.RandomState(9)
    corr = jnp.asarray(rng.randn(2, 3, 11, 240).astype(np.float32))
    pyr = ops.corr_pyramid(corr, 4)
    coords = jnp.asarray(rng.uniform(-30, 270, (2, 3, 11)).astype(np.float32))
    # edge cases: window just touching each end, exact integers, far OOR
    coords = coords.at[0, 0, :8].set(
        jnp.asarray([-6.0, -5.0, 0.0, 239.0, 245.0, 120.0,
                     jnp.nan, jnp.inf]))
    cache = ops.corr_block_cache(pyr, 4)
    a = ops.corr_lookup(pyr, coords, 4)
    b = ops.corr_lookup(pyr, coords, 4, cache=cache)
    # NaN-aware bit equality (NaN/inf centres give NaN through the lerp
    # frac on BOTH paths)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bf16 pyramid storage (the mixed-precision eval path)
    p16 = [p.astype(jnp.bfloat16) for p in pyr]
    a16 = ops.corr_lookup(p16, coords, 4)
    b16 = ops.corr_lookup(p16, coords, 4, cache=ops.corr_block_cache(p16, 4))
    np.testing.assert_array_equal(np.asarray(a16, np.float32),
                                  np.asarray(b16, np.float32))

    def f_flat(c_, co_):
        return jnp.sum(jnp.sin(ops.corr_lookup(ops.corr_pyramid(c_, 4),
                                               co_, 4)))

    def f_blocked(c_, co_):
        p = ops.corr_pyramid(c_, 4)
        return jnp.sum(jnp.sin(ops.corr_lookup(
            p, co_, 4, cache=ops.corr_block_cache(p, 4))))

    ga = jax.grad(f_flat, argnums=(0, 1))(corr, coords)
    gb = jax.grad(f_blocked, argnums=(0, 1))(corr, coords)
    for a_, b_ in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))


def test_warp_onehot_matches_gather():
    from stereoformer_tpu.ops.warp import _sample_x_gather, _sample_x_onehot

    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.randn(2, 3, 12, 4).astype(np.float32))
    xs = jnp.asarray(
        np.stack([
            rng.uniform(-3, 15, (2, 3)), np.zeros((2, 3)),
            np.full((2, 3), 11.0), rng.uniform(0, 11, (2, 3)),
            np.full((2, 3), 5.0), rng.uniform(-3, 15, (2, 3)),
            rng.uniform(-3, 15, (2, 3)), rng.uniform(-3, 15, (2, 3)),
            rng.uniform(-3, 15, (2, 3)), rng.uniform(-3, 15, (2, 3)),
            rng.uniform(-3, 15, (2, 3)), rng.uniform(-3, 15, (2, 3)),
        ], axis=-1).astype(np.float32)
    )  # [2,3,12]
    for border in (True, False):
        a = _sample_x_gather(img, xs, border)
        b = _sample_x_onehot(img, xs, border)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"border={border}")
    # gradients
    ga = jax.grad(lambda i, x: jnp.sum(jnp.sin(_sample_x_gather(i, x, True))), argnums=(0, 1))(img, xs)
    gb = jax.grad(lambda i, x: jnp.sum(jnp.sin(_sample_x_onehot(i, x, True))), argnums=(0, 1))(img, xs)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)
