"""Losses vs torch-reference semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from stereoformer_tpu import losses, metrics


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    gt = (rng.rand(2, 16, 24, 1) * 250 - 10).astype(np.float32)  # some <0, some >192
    preds = [
        (gt + rng.randn(2, 16, 24, 1) * (i + 1)).astype(np.float32)
        for i in range(3)
    ]
    return preds, gt


def torch_sequence_loss(preds, gt, gamma=0.8):
    import torch

    gtt = torch.from_numpy(gt)
    mask = ((gtt < 192).float() * (gtt > 0).float())
    total = 0.0
    n = len(preds)
    for i, p in enumerate(preds):
        w = gamma ** (n - i - 1)
        total = total + (w * (torch.from_numpy(p) * mask - gtt * mask).abs()).mean()
    return float(total)


def test_sequence_loss_matches_torch(data):
    pytest.importorskip("torch")
    preds, gt = data
    want = torch_sequence_loss(preds, gt)
    got = float(losses.sequence_loss([jnp.asarray(p) for p in preds], jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_epe_matches_torch(data):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    preds, gt = data
    gtt = torch.from_numpy(gt)
    p = torch.from_numpy(preds[0])
    mask = (gtt > 0) & (gtt < 192)
    want = float(F.l1_loss(p[mask], gtt[mask]))
    got = float(losses.epe(jnp.asarray(preds[0]), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multi_equal_loss_matches_torch(data):
    torch = pytest.importorskip("torch")

    preds, gt = data
    gtt = torch.from_numpy(gt)
    crit = torch.nn.SmoothL1Loss()
    mask = (gtt < 192) & (gtt >= 0)
    want = 0.0
    for p, w in zip(preds[:2], (0.8, 1.2)):
        pt = torch.from_numpy(p)
        want += float(crit(pt[mask], gtt[mask])) * w
    got = float(
        losses.multi_equal_loss([jnp.asarray(p) for p in preds[:2]], jnp.asarray(gt))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_single_scale_loss_upscales():
    gt = np.full((1, 16, 16, 1), 8.0, np.float32)
    low = jnp.full((1, 2, 2, 1), 1.0)  # 8x smaller, values *8 = 8 == gt
    out = float(losses.single_scale_loss(low, jnp.asarray(gt)))
    assert out < 1e-6


def test_range_and_disparity_loss_runs(data):
    preds, gt = data
    B, H, W, _ = gt.shape
    disp_low = jnp.asarray(np.abs(np.random.RandomState(1).rand(B, H // 8, W // 8, 1)) * 3)
    lower = jnp.ones_like(disp_low) * 0.5
    upper = jnp.ones_like(disp_low) * 0.5
    out = losses.range_and_disparity_loss(
        [jnp.asarray(p) for p in preds[:2]], jnp.asarray(gt), disp_low, lower, upper
    )
    assert np.isfinite(float(out))


def test_total_loss_runs(data):
    preds, gt = data
    B, H, W, _ = gt.shape
    disp_low = jnp.asarray(np.abs(np.random.RandomState(1).rand(B, H // 8, W // 8, 1)) * 3)
    out = losses.total_loss(
        jnp.asarray(preds[0]), jnp.asarray(gt),
        lower_map=jnp.ones_like(disp_low), upper_map=jnp.ones_like(disp_low),
        disp_low=disp_low,
    )
    assert np.isfinite(float(out))
    d_only = losses.total_loss(jnp.asarray(preds[0]), jnp.asarray(gt), disp_only=True)
    assert np.isfinite(float(d_only))


def test_metrics_match_torch(data):
    torch = pytest.importorskip("torch")
    preds, gt = data
    p, g = torch.from_numpy(preds[0]), torch.from_numpy(gt)
    e = (p - g).abs()
    want_d1 = float(((e > 3) & (e / g.abs() > 0.05)).float().mean())
    want_p1 = float((e > 1).float().mean())
    got_d1 = float(metrics.d1_metric(jnp.asarray(preds[0]), jnp.asarray(gt)))
    got_p1 = float(metrics.p1_metric(jnp.asarray(preds[0]), jnp.asarray(gt)))
    np.testing.assert_allclose(got_d1, want_d1, rtol=1e-6)
    np.testing.assert_allclose(got_p1, want_p1, rtol=1e-6)
    m = np.asarray(g > 0)
    want_t = float((e[torch.from_numpy(m)] > 2).float().mean())
    got_t = float(metrics.thres_metric(jnp.asarray(preds[0]), jnp.asarray(gt), jnp.asarray(m), 2.0))
    np.testing.assert_allclose(got_t, want_t, rtol=1e-5)
