"""RAFTStereo: forward shapes, test_mode, gradient flow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoformer_tpu.models import RAFTStereo, get_model

B, H, W = 1, 32, 64


@pytest.fixture(scope="module")
def setup():
    model = RAFTStereo()
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    variables = model.init(
        jax.random.PRNGKey(0), left, right, iters=2, train=False
    )
    return model, variables, left, right


def test_forward_shapes(setup):
    model, variables, left, right = setup
    out = model.apply(variables, left, right, iters=3, train=False)
    assert len(out["disparities"]) == 3
    for d in out["disparities"]:
        assert d.shape == (B, H, W, 1)
        assert bool(jnp.isfinite(d).all())
    assert out["flow_low"].shape == (B, H // 4, W // 4, 1)


def test_test_mode_single_output(setup):
    model, variables, left, right = setup
    out = model.apply(
        variables, left, right, iters=3, test_mode=True, train=False
    )
    assert len(out["disparities"]) == 1


def test_flow_init(setup):
    model, variables, left, right = setup
    init = jnp.full((B, H // 4, W // 4, 1), 2.0)
    out = model.apply(
        variables, left, right, iters=1, flow_init=init, train=False
    )
    assert bool(jnp.isfinite(out["disparities"][0]).all())


def test_gradients_flow(setup):
    model, variables, left, right = setup

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            left, right, iters=2, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.abs(d).mean() for d in out["disparities"])

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    nonzero = [float(jnp.abs(g).sum()) > 0 for g in leaves]
    assert sum(nonzero) > len(nonzero) * 0.7


def test_registry(setup):
    m = get_model("RAFT_Stereo")
    assert isinstance(m, RAFTStereo)


def test_raft_trainable_via_trainer():
    """The shared trainer contract (registry + max_disp + ImageNet-
    normalised pipeline) must work for the RAFT family."""
    from stereoformer_tpu.train import DisparityTrainer

    tr = DisparityTrainer(
        lr=1e-4, dataset="dummy", batch_size=2, test_batch=2,
        model="RAFT_Stereo", loss="sequence", train_iters=2, eval_iters=2,
        crop_size=(32, 64), num_workers=0, mesh=None,
    )
    tr.initialize()
    loss, epe, _ = tr.train_one_epoch(0, 0, 0, None)
    assert np.isfinite(loss) and np.isfinite(epe)
    v = tr.validate(None, 0)
    assert np.isfinite(v)


class TestGroupNormNHWC:
    """GroupNormNHWC (reshape-free TPU form) must match flax.linen.GroupNorm
    in value and gradient — it replaces it inside every RAFT encoder norm."""

    @pytest.mark.parametrize("groups,affine", [(4, True), (32, False), (1, True)])
    def test_value_and_grad_parity(self, groups, affine):
        import flax.linen as nn
        from stereoformer_tpu.nn.raft.encoders import GroupNormNHWC

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 5, 7, 32).astype(np.float32) * 3 + 1)
        ref = nn.GroupNorm(num_groups=groups, use_scale=affine, use_bias=affine)
        new = GroupNormNHWC(num_groups=groups, use_scale=affine, use_bias=affine)
        vref = ref.init(jax.random.PRNGKey(0), x)
        # param trees are identical by construction (scale/bias of shape [C])
        yref = ref.apply(vref, x)
        ynew = new.apply(vref, x)
        assert ynew.shape == yref.shape and ynew.dtype == yref.dtype
        np.testing.assert_allclose(np.asarray(ynew), np.asarray(yref), rtol=2e-5, atol=2e-6)

        def loss_ref(v, x):
            return jnp.sum(jnp.sin(ref.apply(v, x)))

        def loss_new(v, x):
            return jnp.sum(jnp.sin(new.apply(v, x)))

        gref = jax.grad(loss_ref, argnums=(0, 1))(vref, x)
        gnew = jax.grad(loss_new, argnums=(0, 1))(vref, x)
        for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gnew)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-5, atol=2e-5)

    @pytest.mark.parametrize("groups,affine", [(4, True), (32, False)])
    def test_stats_only_affine_form(self, groups, affine):
        """stats_only returns (s, t) with x*s + t == the applied norm —
        the contract the fused conv prologue builds on."""
        from stereoformer_tpu.nn.raft.encoders import GroupNormNHWC

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 5, 7, 32).astype(np.float32) * 2 - 1)
        mod = GroupNormNHWC(num_groups=groups, use_scale=affine,
                            use_bias=affine)
        v = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(v, x)
        s, t = mod.apply(v, x, stats_only=True)
        assert s.shape == (2, 32) and jnp.shape(t) in ((2, 32), ())
        got = x * s[:, None, None, :] + jnp.reshape(
            jnp.broadcast_to(t, (2, 32)), (2, 1, 1, 32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_bf16_promotion_matches_flax(self):
        import flax.linen as nn
        from stereoformer_tpu.nn.raft.encoders import GroupNormNHWC

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32)).astype(jnp.bfloat16)
        for kw in (dict(use_scale=True, use_bias=True), dict(use_scale=False, use_bias=False)):
            ref = nn.GroupNorm(num_groups=4, **kw)
            new = GroupNormNHWC(num_groups=4, **kw)
            v = ref.init(jax.random.PRNGKey(0), x)
            yref = ref.apply(v, x)
            ynew = new.apply(v, x)
            assert ynew.dtype == yref.dtype
            np.testing.assert_allclose(
                np.asarray(ynew, np.float32), np.asarray(yref, np.float32), rtol=2e-2, atol=2e-2
            )


def test_bf16_dtype_path(setup):
    """dtype=bf16 RAFT runs end-to-end; coordinates/flow-head/mask stay f32
    and the outputs track the f32 model on an untrained init."""
    _, variables, left, right = setup
    model32 = RAFTStereo()
    model16 = RAFTStereo(dtype=jnp.bfloat16)
    out32 = model32.apply(variables, left, right, iters=2, test_mode=True, train=False)
    out16 = model16.apply(variables, left, right, iters=2, test_mode=True, train=False)
    d32 = out32["disparities"][-1]
    d16 = out16["disparities"][-1]
    assert d16.dtype == jnp.float32  # coordinate math stays f32
    assert d16.shape == d32.shape
    assert np.isfinite(np.asarray(d16)).all()
    # relative agreement: untrained outputs are O(100) here and chaotic, so
    # bound the relative error and require strong correlation
    scale = float(jnp.max(jnp.abs(d32))) + 1.0
    assert float(jnp.max(jnp.abs(d16 - d32))) / scale < 0.10
    cc = np.corrcoef(np.asarray(d32).ravel(), np.asarray(d16).ravel())[0, 1]
    assert cc > 0.99


def test_remat_update_knob_cli_plumbing():
    """``--remat_update`` reaches the model: registry passes the field
    through, the trainer gates it to the RAFT family, and the lifted
    nn.remat keeps the parameter tree unchanged (checkpoints load)."""
    import pytest

    from stereoformer_tpu.models import get_model
    from stereoformer_tpu.train import DisparityTrainer

    m = get_model("RAFT_Stereo", remat_update=True)
    assert m.remat_update is True

    t = DisparityTrainer(
        lr=1e-3, dataset="dummy", model="RAFT_Stereo", batch_size=1, test_batch=1,
        crop_size=(32, 64), mesh=None, remat_update=True, num_workers=0,
    )
    t._build_net()
    assert t.net.remat_update is True

    t2 = DisparityTrainer(
        lr=1e-3, dataset="dummy", model="LowCNN_gru", batch_size=1, test_batch=1,
        crop_size=(32, 64), mesh=None, remat_update=True, num_workers=0,
    )
    with pytest.raises(AssertionError):
        t2._build_net()


def test_groupnorm_precomputed_sums_parity():
    """GroupNormNHWC fed kernel-style precomputed (Σx, Σx²) must equal
    the einsum-stats path — full apply, stats_only affine form, and the
    instance-norm configuration."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stereoformer_tpu.nn.raft.encoders import GroupNormNHWC

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(3, 6, 10, 16).astype(np.float32))
    s1 = jnp.sum(x, axis=(1, 2)).astype(jnp.float32)
    s2 = jnp.sum(jnp.square(x), axis=(1, 2)).astype(jnp.float32)

    for groups, kw in ((4, {}), (16, {"use_bias": False,
                                      "use_scale": False})):
        mod = GroupNormNHWC(num_groups=groups, **kw)
        v = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(v, x)
        got = mod.apply(v, x, precomputed_sums=(s1, s2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        ws, wt = mod.apply(v, x, stats_only=True)
        gs, gt = mod.apply(v, x, stats_only=True,
                           precomputed_sums=(s1, s2))
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(wt),
                                   rtol=1e-5, atol=1e-5)
