"""LowCNN family: init + forward shape/finite checks for every variant,
and a gradient-flows test for the GRU variant."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu.models import LowCNN, available_models, get_model

B, H, W = 1, 32, 64


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    return left, right


def _run(model, images, **kw):
    left, right = images
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False, **kw)
    out = model.apply(variables, left, right, train=False, **kw)
    return variables, out


@pytest.mark.parametrize(
    "refinement,n_out",
    [("none", 1), ("fixed", 2), ("variance", 2), ("learned", 2),
     ("learned_supervised", 2)],
)
def test_variants_forward(images, refinement, n_out):
    model = LowCNN(refinement=refinement)
    _, out = _run(model, images)
    assert len(out["disparities"]) == n_out
    for d in out["disparities"]:
        assert d.shape == (B, H, W, 1)
        assert bool(jnp.isfinite(d).all())
    assert out["disp_low"].shape == (B, H // 8, W // 8, 1)
    assert float(out["disp_low"].min()) >= 0
    if refinement == "learned_supervised":
        lo, up = out["bounds"]
        assert lo.shape == (B, H // 8, W // 8, 1)


@pytest.mark.parametrize("refinement", ["gru", "gru_feature"])
def test_gru_variants_forward(images, refinement):
    model = LowCNN(refinement=refinement)
    _, out = _run(model, images, iters=3)
    assert len(out["disparities"]) == 3
    for d in out["disparities"]:
        assert d.shape == (B, H, W, 1)
        assert bool(jnp.isfinite(d).all())


def test_gru_gradients_flow(images):
    left, right = images
    model = LowCNN(refinement="gru")
    variables = model.init(jax.random.PRNGKey(0), left, right, iters=2, train=True)
    params = variables["params"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            left, right, iters=2, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.abs(d).mean() for d in out["disparities"])

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # the GRU offset head must receive gradient (STE/lerp path intact)
    nonzero = [float(jnp.abs(g).sum()) > 0 for g in flat]
    assert sum(nonzero) > len(nonzero) * 0.8


def test_registry_names(images):
    names = available_models()
    assert "LowCNN_gru" in names and "LowCNN_ada" in names
    m = get_model("LowCNN_gru")
    assert m.refinement == "gru"


def test_simple_upsample_path(images):
    model = LowCNN(refinement="none", upsample="simple")
    _, out = _run(model, images)
    assert out["disparities"][0].shape == (B, H, W, 1)


def test_bf16_mixed_precision(images):
    """bf16 compute path: f32 params, finite f32 outputs, close to the f32
    forward with identical params."""
    left, right = images
    f32 = LowCNN(refinement="gru")
    bf16 = LowCNN(refinement="gru", dtype=jnp.bfloat16)
    variables = f32.init(jax.random.PRNGKey(0), left, right, iters=2, train=False)
    # params must be dtype-independent (same tree works for both)
    out32 = f32.apply(variables, left, right, iters=2, train=False)
    out16 = bf16.apply(variables, left, right, iters=2, train=False)
    d32, d16 = out32["disparities"][-1], out16["disparities"][-1]
    assert d16.dtype == jnp.float32
    assert bool(jnp.isfinite(d16).all())
    # same network, lower precision: outputs track within ~1px on random init
    assert float(jnp.abs(d32 - d16).mean()) < 1.5


def test_concat_cost_volume_mode(images):
    model = LowCNN(refinement="fixed", cost_volume="concat")
    _, out = _run(model, images)
    assert len(out["disparities"]) == 2
    assert bool(jnp.isfinite(out["disparities"][-1]).all())


def test_scan_loop_matches_unroll(images):
    """loop="scan" must share the unrolled loop's parameter tree and
    produce identical outputs (values + BN stat updates)."""
    left, right = images
    unroll = LowCNN(refinement="gru", loop="unroll")
    scan = LowCNN(refinement="gru", loop="scan")
    variables = unroll.init(jax.random.PRNGKey(0), left, right, iters=3, train=False)
    # identical param structure -> scan can consume unroll's variables
    out_u = unroll.apply(variables, left, right, iters=3, train=False)
    out_s = scan.apply(variables, left, right, iters=3, train=False)
    assert len(out_u["disparities"]) == len(out_s["disparities"]) == 3
    for a, b in zip(out_u["disparities"], out_s["disparities"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # train mode: BN stats update identically
    (_, mu), = [
        (None, m["batch_stats"]) for m in [
            unroll.apply(variables, left, right, iters=3, train=True,
                         mutable=["batch_stats"])[1]
        ]
    ]
    (_, ms), = [
        (None, m["batch_stats"]) for m in [
            scan.apply(variables, left, right, iters=3, train=True,
                       mutable=["batch_stats"])[1]
        ]
    ]
    for a, b in zip(jax.tree_util.tree_leaves(mu), jax.tree_util.tree_leaves(ms)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )


def test_scan_unroll_factor_matches_unroll(images):
    """loop="scan" with scan_unroll=k (lax.scan unroll window, a partial
    cross-iteration fusion window for XLA) must keep the parameter tree
    and outputs of the fully unrolled loop, including a non-divisor k
    (lax.scan handles the remainder iterations)."""
    left, right = images
    unroll = LowCNN(refinement="gru", loop="unroll")
    variables = unroll.init(
        jax.random.PRNGKey(0), left, right, iters=3, train=False
    )
    out_u = unroll.apply(variables, left, right, iters=3, train=False)
    for k in (2, 3):
        scan_k = LowCNN(refinement="gru", loop="scan", scan_unroll=k)
        out_s = scan_k.apply(variables, left, right, iters=3, train=False)
        assert len(out_s["disparities"]) == 3
        for a, b in zip(out_u["disparities"], out_s["disparities"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )


def test_stem_conv_bit_equivalent():
    """StemConv (space-to-depth) must equal a plain 7x7 s2 conv+leakyrelu
    with the same weights."""
    import flax.linen as nn_

    from stereoformer_tpu.nn.blocks import StemConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    stem = StemConv(features=16)
    v = stem.init(jax.random.PRNGKey(0), x)
    w = v["params"]["kernel"]
    b = v["params"]["bias"]
    got = stem.apply(v, x)
    want = nn_.leaky_relu(
        jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b,
        negative_slope=0.1,
    )
    assert got.shape == want.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
