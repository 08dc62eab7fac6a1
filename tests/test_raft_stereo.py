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
