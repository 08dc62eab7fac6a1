"""CrossAttentionStereo family + banded attention ops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu import ops
from stereoformer_tpu.models import CrossAttentionStereo, get_model


def test_banded_attention_scores_match_gwc():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 3, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 3, 16, 8).astype(np.float32))
    s = ops.banded_attention_scores(q, k, 4, num_heads=2)
    assert s.shape == (1, 3, 16, 4, 2)
    # head 0 at (w=5, d=2): dot of first 4 channels / sqrt(4)
    want = (np.asarray(q)[0, 1, 5, :4] * np.asarray(k)[0, 1, 3, :4]).sum() / 2.0
    np.testing.assert_allclose(float(s[0, 1, 5, 2, 0]), want, rtol=1e-5)


def test_banded_attention_value_blend():
    """With a score peak at d=1 the attended feature must be v shifted by 1."""
    B, H, W, C = 1, 2, 8, 4
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    # q/k engineered so d=1 dominates: k[w] = q[w+1]·scale, so the band
    # score <q[w], k[w-1]> = |q[w]|²·scale peaks at d=1
    q = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32) * 10)
    k = jnp.pad(q, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    scores, att = ops.banded_attention(q, k, v, 4, num_heads=1)
    assert att.shape == v.shape
    # where valid (w>=1), attended ≈ v[w-1]
    err = np.abs(np.asarray(att)[:, :, 2:] - np.asarray(v)[:, :, 1:-1]).mean()
    assert err < 0.5  # soft attention: approximately the shifted value


def test_cross_attention_model_forward():
    model = CrossAttentionStereo()
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, iters=2, train=False)
    out = model.apply(variables, left, right, iters=2, train=False)
    assert len(out["disparities"]) == 2
    assert out["disparities"][-1].shape == (1, 32, 64, 1)
    assert bool(jnp.isfinite(out["disparities"][-1]).all())
    assert float(out["disp_low"].min()) >= 0


def test_cross_attention_gradients():
    model = CrossAttentionStereo()
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, iters=1, train=False)

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            left, right, iters=1, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.abs(d).mean() for d in out["disparities"])

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # attention projections receive gradient
    assert float(jnp.abs(g["proj_q"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["proj_v"]["kernel"]).sum()) > 0


def test_registry():
    m = get_model("CrossAttentionStereo")
    assert isinstance(m, CrossAttentionStereo)


def test_cross_attention_trainable_via_trainer():
    from stereoformer_tpu.train import DisparityTrainer

    tr = DisparityTrainer(
        lr=1e-4, dataset="dummy", batch_size=2, test_batch=2,
        model="CrossAttentionStereo", loss="sequence",
        train_iters=1, eval_iters=1, crop_size=(32, 64), num_workers=0,
    )
    tr.initialize()
    loss, epe, _ = tr.train_one_epoch(0, 0, 0, None)
    assert np.isfinite(loss)
