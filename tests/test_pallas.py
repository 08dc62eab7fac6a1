"""Pallas kernels vs XLA reference ops (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu import ops
from stereoformer_tpu.ops.pallas import corr_band, fused_local_soft_argmin


@pytest.fixture(scope="module")
def vol_cands():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(2, 4, 30, 24).astype(np.float32))
    cands = jnp.asarray(rng.uniform(-2, 26, (2, 4, 30, 21)).astype(np.float32))
    return vol, cands


def test_fused_local_refine_matches_xla(vol_cands):
    vol, cands = vol_cands
    want = ops.local_soft_argmin(vol, cands)
    got = fused_local_soft_argmin(vol, cands, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_local_refine_grads(vol_cands):
    vol, cands = vol_cands

    def f_ref(v, c):
        return jnp.sum(jnp.sin(ops.local_soft_argmin(v, c)))

    def f_ker(v, c):
        return jnp.sum(jnp.sin(fused_local_soft_argmin(v, c, True)))

    ga = jax.grad(f_ref, argnums=(0, 1))(vol, cands)
    gb = jax.grad(f_ker, argnums=(0, 1))(vol, cands)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_local_refine_grads_at_subgradient_points():
    """Exact integer / boundary candidates: the kernel's hand-written
    backward must reproduce the XLA autodiff's subgradient choices
    (clip-boundary 0.5 tie, Δ=0 tie cancelling, relu'(0)=0)."""
    rng = np.random.RandomState(3)
    vol = jnp.asarray(rng.randn(1, 2, 8, 24).astype(np.float32))
    # candidates exactly at 0, D-1, interior integers, and hat edges
    cands = jnp.asarray(
        np.stack([
            np.full((2, 8), 0.0), np.full((2, 8), 23.0),
            np.full((2, 8), 5.0), np.full((2, 8), 4.5),
            np.full((2, 8), 6.0), np.full((2, 8), -1.0),
            np.full((2, 8), 24.0), np.full((2, 8), 11.25),
        ], axis=-1)[None].astype(np.float32)
    )

    def f_ref(v, c):
        return jnp.sum(jnp.sin(ops.local_soft_argmin(v, c)))

    def f_ker(v, c):
        return jnp.sum(jnp.sin(fused_local_soft_argmin(v, c, True)))

    ga = jax.grad(f_ref, argnums=(0, 1))(vol, cands)
    gb = jax.grad(f_ker, argnums=(0, 1))(vol, cands)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.fixture(scope="module")
def feats():
    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.randn(1, 3, 32, 16).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 3, 32, 16).astype(np.float32))
    return left, right


def test_corr_band_matches_xla(feats):
    left, right = feats
    want = ops.correlation_volume_matmul(left, right, 8)
    got = corr_band(left, right, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_corr_band_grads(feats):
    left, right = feats

    def f_ref(l, r):
        return jnp.sum(jnp.sin(ops.correlation_volume_matmul(l, r, 8)))

    def f_ker(l, r):
        return jnp.sum(jnp.sin(corr_band(l, r, 8, True)))

    ga = jax.grad(f_ref, argnums=(0, 1))(left, right)
    gb = jax.grad(f_ker, argnums=(0, 1))(left, right)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
