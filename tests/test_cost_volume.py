"""Cost-volume ops vs. naive references and torch-CPU cross-checks.

The naive loops below re-state the reference semantics
(models/utils/build_cost_volume.py:5-54) independently of the vectorised
implementations under test.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from stereoformer_tpu import ops


def naive_correlation(left, right, max_disp):
    B, H, W, C = left.shape
    out = np.zeros((B, H, W, max_disp), np.float32)
    for d in range(max_disp):
        for w in range(W):
            if w - d >= 0:
                out[:, :, w, d] = (left[:, :, w] * right[:, :, w - d]).mean(-1)
    return out


@pytest.fixture(scope="module")
def feats():
    rng = np.random.RandomState(0)
    left = rng.randn(2, 6, 16, 8).astype(np.float32)
    right = rng.randn(2, 6, 16, 8).astype(np.float32)
    return left, right


def test_correlation_matches_naive(feats):
    left, right = feats
    want = naive_correlation(left, right, 5)
    got = np.asarray(ops.correlation_volume_matmul(jnp.asarray(left), jnp.asarray(right), 5))
    np.testing.assert_allclose(got, want, atol=1e-5)
    got2 = np.asarray(ops.correlation_volume_shift(jnp.asarray(left), jnp.asarray(right), 5))
    np.testing.assert_allclose(got2, want, atol=1e-5)


def test_correlation_matches_torch_reference(feats):
    torch = pytest.importorskip("torch")
    left, right = feats
    # reference loop in NCHW (build_cost_volume.py:39-47)
    lt = torch.from_numpy(left).permute(0, 3, 1, 2)
    rt = torch.from_numpy(right).permute(0, 3, 1, 2)
    D = 5
    cv = lt.new_zeros(2, D, 6, 16)
    for i in range(D):
        if i > 0:
            cv[:, i, :, i:] = (lt[:, :, :, i:] * rt[:, :, :, :-i]).mean(dim=1)
        else:
            cv[:, i] = (lt * rt).mean(dim=1)
    want = cv.permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.correlation_volume(jnp.asarray(left), jnp.asarray(right), D))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_concat_volume(feats):
    left, right = feats
    got = np.asarray(ops.concat_volume(jnp.asarray(left), jnp.asarray(right), 4))
    assert got.shape == (2, 6, 16, 4, 16)
    # spot-check semantics incl. zeroing of w < d
    for d in (0, 3):
        for w in (0, 5, 15):
            if w - d >= 0:
                np.testing.assert_allclose(got[:, :, w, d, :8], left[:, :, w], atol=1e-6)
                np.testing.assert_allclose(got[:, :, w, d, 8:], right[:, :, w - d], atol=1e-6)
            else:
                np.testing.assert_allclose(got[:, :, w, d], 0.0)


def test_difference_volume(feats):
    left, right = feats
    got = np.asarray(ops.difference_volume(jnp.asarray(left), jnp.asarray(right), 4))
    assert got.shape == (2, 6, 16, 4, 8)
    np.testing.assert_allclose(
        got[:, :, 5, 2], left[:, :, 5] - right[:, :, 3], atol=1e-6
    )
    np.testing.assert_allclose(got[:, :, 1, 2], 0.0)


def test_gwc_volume(feats):
    left, right = feats
    G = 4
    got = np.asarray(ops.gwc_volume(jnp.asarray(left), jnp.asarray(right), 4, G))
    assert got.shape == (2, 6, 16, 4, G)
    # group g at (w, d) = mean over its channels
    cpg = 8 // G
    for g in range(G):
        want = (left[:, :, 5, g * cpg:(g + 1) * cpg] * right[:, :, 3, g * cpg:(g + 1) * cpg]).mean(-1)
        np.testing.assert_allclose(got[:, :, 5, 2, g], want, atol=1e-5)
    np.testing.assert_allclose(got[:, :, 1, 2], 0.0)


def test_soft_argmin_uniform_is_center():
    vol = jnp.zeros((1, 4, 4, 24))
    disp = np.asarray(ops.soft_argmin(vol))
    np.testing.assert_allclose(disp, 11.5, atol=1e-5)


def test_soft_argmin_peak():
    vol = np.full((1, 2, 2, 24), -1e9, np.float32)
    vol[..., 7] = 0.0
    disp = np.asarray(ops.soft_argmin(jnp.asarray(vol)))
    np.testing.assert_allclose(disp, 7.0, atol=1e-4)
    # match_similarity=False negates
    disp2 = np.asarray(ops.soft_argmin(jnp.asarray(-vol), match_similarity=False))
    np.testing.assert_allclose(disp2, 7.0, atol=1e-4)


def test_disparity_variance():
    rng = np.random.RandomState(1)
    logits = rng.randn(1, 3, 5, 24).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    mu = (prob * np.arange(24)).sum(-1)
    want = np.sqrt((prob * (np.arange(24) - mu[..., None]) ** 2).sum(-1))
    got = np.asarray(
        ops.disparity_variance(jnp.asarray(prob), jnp.asarray(mu[..., None]))
    )
    np.testing.assert_allclose(got[..., 0], want, atol=1e-5)
