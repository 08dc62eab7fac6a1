"""Auxiliary modules: 3D hourglass aggregation, spatial-attention residual
refiners, InputPadder/gauss_blur/forward_interpolate."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu import ops
from stereoformer_tpu.nn import (
    ConvBn3D,
    Hourglass3D,
    ResSubmoduleAttention,
    SAModule,
    cost_volume_pyramid,
)


def test_hourglass3d():
    m = Hourglass3D(features=8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_cost_volume_pyramid():
    rng = np.random.RandomState(0)
    lf = [jnp.asarray(rng.randn(1, 8, 16, 4).astype(np.float32)),
          jnp.asarray(rng.randn(1, 4, 8, 4).astype(np.float32))]
    rf = [jnp.asarray(rng.randn(1, 8, 16, 4).astype(np.float32)),
          jnp.asarray(rng.randn(1, 4, 8, 4).astype(np.float32))]
    pyr = cost_volume_pyramid(lf, rf, 8)
    assert pyr[0].shape == (1, 8, 16, 8)
    assert pyr[1].shape == (1, 4, 8, 4)


def test_sa_module_range():
    m = SAModule()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 10).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 8, 8, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


@pytest.mark.parametrize("deform", [False, True])
def test_res_submodule_attention(deform):
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    disp = jnp.asarray(np.abs(rng.randn(1, 16, 32, 1)).astype(np.float32))
    feat = jnp.asarray(rng.randn(1, 16, 32, 32).astype(np.float32))
    m = ResSubmoduleAttention(scale=1, out_planes=16, deform=deform)
    v = m.init(jax.random.PRNGKey(0), left, right, disp, feat, train=False)
    res = m.apply(v, left, right, disp, feat, train=False)
    assert res.shape == (1, 16, 32, 1)
    assert bool(jnp.isfinite(res).all())


def test_input_padder():
    x = jnp.ones((1, 30, 61, 3))
    p = ops.InputPadder(x.shape, divisor=8)
    y = p.pad(x)
    assert y.shape[1] % 8 == 0 and y.shape[2] % 8 == 0
    back = p.unpad(y)
    assert back.shape == x.shape
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_gauss_blur_smooths():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    y = ops.gauss_blur(x)
    assert y.shape == x.shape
    # interior mean preserved (zero padding darkens a 2px border)
    np.testing.assert_allclose(
        float(y[:, 4:-4, 4:-4].mean()), float(x[:, 4:-4, 4:-4].mean()),
        atol=3e-2,
    )
    assert float(jnp.var(y)) < float(jnp.var(x))
    # a constant image stays constant in the interior
    c = ops.gauss_blur(jnp.ones((1, 16, 16, 1)))
    np.testing.assert_allclose(np.asarray(c[0, 4:-4, 4:-4, 0]), 1.0, atol=1e-5)


def test_forward_interpolate():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 2.0  # everything moves +2 in x
    out = ops.forward_interpolate(flow)
    assert out.shape == (8, 8, 2)
    # splatted region carries the flow value
    assert np.allclose(out[:, 2:, 0][out[:, 2:, 0] > 0], 2.0)
