"""Local cost-volume resampling: value + gradient parity with the torch
reference (Attempts/update.py:326-345 incl. its STE/.long() gradient
behaviour)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu import ops


def torch_reference_resample(volume_nchw, cands_nchw):
    """Verbatim-semantics torch reference (update.py:326-345)."""
    import torch

    old_volume = torch.from_numpy(volume_nchw).requires_grad_(True)
    s = torch.from_numpy(cands_nchw).requires_grad_(True)
    D = old_volume.shape[1]

    def ste_ceil(x):
        return torch.ceil(x) - x.detach() + x

    def ste_floor(x):
        return torch.floor(x) - x.detach() + x

    ceil_i = torch.clamp(ste_ceil(s), min=0, max=D - 1).long()
    floor_i = torch.clamp(ste_floor(s), min=0, max=D - 1).long()
    floor_rate = ceil_i - s
    ceil_rate = 1.0 - floor_rate
    fv = torch.gather(old_volume, dim=1, index=floor_i)
    cv = torch.gather(old_volume, dim=1, index=ceil_i)
    out = fv * floor_rate + cv * ceil_rate
    g = torch.ones_like(out)
    out.backward(g)
    return (
        out.detach().numpy(),
        old_volume.grad.numpy(),
        s.grad.numpy(),
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    vol = rng.randn(2, 6, 4, 5).astype(np.float32)       # B,D,H,W (torch)
    # candidates incl. exact ints, negatives, > D-1
    cands = np.concatenate(
        [
            rng.uniform(-1.5, 7.5, (2, 9, 4, 5)).astype(np.float32),
            np.broadcast_to(
                np.array([0.0, 2.0], np.float32)[None, :, None, None], (2, 2, 4, 5)
            ),
        ],
        axis=1,
    )
    return vol, cands


@pytest.mark.parametrize("method", ["gather", "hat"])
def test_resample_value_and_grads_match_torch(data, method):
    pytest.importorskip("torch")
    vol, cands = data
    want, want_dvol, want_dc = torch_reference_resample(vol, cands)

    vol_j = jnp.asarray(vol.transpose(0, 2, 3, 1))        # NHWC: B,H,W,D
    cands_j = jnp.asarray(cands.transpose(0, 2, 3, 1))    # B,H,W,S

    def f(v, c):
        return jnp.sum(ops.resample_volume(v, c, method=method))

    out = ops.resample_volume(vol_j, cands_j, method=method)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), want, atol=1e-5
    )
    dvol, dc = jax.grad(f, argnums=(0, 1))(vol_j, cands_j)
    np.testing.assert_allclose(
        np.asarray(dvol).transpose(0, 3, 1, 2), want_dvol, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dc).transpose(0, 3, 1, 2), want_dc, atol=1e-5
    )


def test_hat_equals_gather_on_edge_cases():
    rng = np.random.RandomState(11)
    vol = jnp.asarray(rng.randn(2, 3, 4, 24).astype(np.float32))
    # exact ints, far out of range both sides, boundary-straddling
    cands = jnp.asarray(
        np.stack(
            [
                rng.uniform(-30, 60, (2, 3, 4)),
                np.full((2, 3, 4), 23.0),
                np.full((2, 3, 4), 0.0),
                np.full((2, 3, 4), -0.5),
                np.full((2, 3, 4), 23.5),
                rng.uniform(0, 23, (2, 3, 4)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    a = ops.resample_volume(vol, cands, method="gather")
    b = ops.resample_volume(vol, cands, method="hat")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ga = jax.grad(lambda v, c: jnp.sum(jnp.sin(ops.resample_volume(v, c, method="gather"))), argnums=(0, 1))(vol, cands)
    gb = jax.grad(lambda v, c: jnp.sum(jnp.sin(ops.resample_volume(v, c, method="hat"))), argnums=(0, 1))(vol, cands)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_resample_exact_integers_identity():
    rng = np.random.RandomState(3)
    vol = jnp.asarray(rng.randn(1, 2, 3, 8).astype(np.float32))
    cands = jnp.broadcast_to(
        jnp.arange(8, dtype=jnp.float32)[None, None, None, :], (1, 2, 3, 8)
    )
    out = ops.resample_volume(vol, cands)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-6)


def test_make_candidates_invalid_fallback():
    # pixel with lower < 0 must collapse all candidates to cur_disp
    lower = jnp.array([[[[-1.0]]]])
    upper = jnp.array([[[[3.0]]]])
    cur = jnp.array([[[[1.5]]]])
    cands = ops.make_candidates(lower, upper, cur, 4, max_disp=24)
    np.testing.assert_allclose(np.asarray(cands), 1.5)
    # valid pixel: uniform spacing lower..upper
    cands2 = ops.make_candidates(
        jnp.array([[[[2.0]]]]), jnp.array([[[[6.0]]]]), cur, 4, max_disp=24
    )
    np.testing.assert_allclose(
        np.asarray(cands2)[0, 0, 0], [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6
    )


def test_fixed_local_refinement_recovers_peak():
    """A sharply peaked volume + slightly-off initial disparity: the fixed
    local volume should pull the estimate toward the peak."""
    D = 24
    vol = np.full((1, 4, 4, D), -20.0, np.float32)
    vol[..., 10] = 20.0
    cur = jnp.full((1, 4, 4, 1), 9.0)
    out = ops.fixed_local_cost_volume(jnp.asarray(vol), cur, radius=2.0, num_samples=20)
    assert abs(float(out.mean()) - 10.0) < 0.3


def test_variance_local_cost_volume_shapes():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(2, 5, 6, 24).astype(np.float32))
    cur = jnp.asarray(np.abs(rng.randn(2, 5, 6, 1)).astype(np.float32) * 3)
    for valid in (False, True):
        out = ops.variance_local_cost_volume(vol, cur, gamma=1.0, num_samples=20, consider_valid=valid)
        assert out.shape == (2, 5, 6, 1)
        assert np.isfinite(np.asarray(out)).all()
