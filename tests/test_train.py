"""Training layer: LR-schedule parity, overfit-on-dummy (loss decreases),
checkpoint round-trip, SPMD mesh train step on the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from stereoformer_tpu import parallel
from stereoformer_tpu.data import DummyStereoDataset, DataLoader, train_transform
from stereoformer_tpu.models import LowCNN
from stereoformer_tpu.train import (
    TrainState,
    make_eval_step,
    make_step_schedule,
    make_train_step,
    reference_lr,
    restore_checkpoint,
    save_checkpoint,
)


def test_reference_lr_schedule():
    """Parity with trainer_DLC_GRU.py:136-146."""
    lr = 1e-3
    for epoch, want in [
        (0, lr), (10, lr), (19, lr),
        (20, lr / 2), (29, lr / 2),
        (30, lr / 4), (39, lr / 4),
        (40, lr / 6), (50, lr / 8),
    ]:
        got = float(reference_lr(lr, epoch))
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=str(epoch))


def _tiny_setup(refinement="fixed", loss_name="single", iters=2, B=2, H=32, W=64):
    model = LowCNN(refinement=refinement)
    left = jnp.zeros((B, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, iters=iters, train=False)
    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(model, tx, loss_name, iters=iters)
    return model, state, step


def _dummy_batch(B=2, H=32, W=64, seed=0):
    ds = DummyStereoDataset(length=B, height=H, width=W, max_disp=12, seed=seed)
    rng = np.random.default_rng(0)
    samples = [
        train_transform(ds[i], rng, crop=(H, W)) for i in range(B)
    ]
    return {
        "img_left": jnp.asarray(np.stack([s["img_left"] for s in samples])),
        "img_right": jnp.asarray(np.stack([s["img_right"] for s in samples])),
        "gt_disp": jnp.asarray(
            np.stack([s["gt_disp"] for s in samples])[..., None]
        ),
    }


def test_train_step_decreases_loss():
    _, state, step = _tiny_setup()
    batch = _dummy_batch()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_train_step_gru_sequence_loss():
    _, state, step = _tiny_setup(refinement="gru", loss_name="sequence", iters=2)
    batch = _dummy_batch()
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0


def test_eval_step_scale_disp():
    model, state, _ = _tiny_setup()
    es = make_eval_step(model, iters=2)
    # eval at a different resolution than gt: pred must be rescaled
    batch = _dummy_batch(B=1, H=32, W=64)
    batch["gt_disp"] = jnp.asarray(
        np.random.RandomState(0).rand(1, 30, 60, 1).astype(np.float32) * 10
    )
    m = es(state, batch)
    assert np.isfinite(float(m["epe"]))
    assert 0 <= float(m["p1"]) <= 1


def test_checkpoint_roundtrip(tmp_path):
    _, state, step = _tiny_setup()
    batch = _dummy_batch()
    state, _ = step(state, batch)
    p = save_checkpoint(str(tmp_path), state, "LowCNN", 0, 3, 1.234, True)
    from stereoformer_tpu.train import finalize_checkpoints

    finalize_checkpoints()
    # mutate, then restore into the same structure
    zero_state = jax.tree_util.tree_map(jnp.zeros_like, state)
    back = restore_checkpoint(p, zero_state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    import os

    assert os.path.isdir(os.path.join(str(tmp_path), "model_best"))


def test_spmd_mesh_train_step():
    """Batch sharded over the virtual 8-device mesh; params replicated;
    the jitted step must produce the same loss as single-device."""
    assert len(jax.devices()) == 8
    mesh = parallel.make_mesh()
    model, state, step = _tiny_setup(B=8)
    batch = _dummy_batch(B=8)
    # the step donates its state; keep an independent copy for the mesh run
    sharded_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.copy(x), parallel.replicated(mesh)), state
    )
    # single-device result
    state1, m1 = step(state, batch)

    sharded_batch = parallel.shard_batch(
        {k: np.asarray(v) for k, v in batch.items()}, mesh
    )
    state2, m2 = step(sharded_state, sharded_batch)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    # params stay replicated and finite
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert bool(jnp.isfinite(leaf).all())


def _spmd_loss_parity(model, loss_name, batch, init_train=True, rtol=1e-4):
    """One train step single-device vs batch-row-sharded on the 8-mesh:
    losses must agree (the mesh analogue of wrapping every trainer in
    DataParallel, trainer_DLC_GRU.py:102-106)."""
    assert len(jax.devices()) == 8
    mesh = parallel.make_mesh()
    variables = jax.jit(
        lambda l, r: model.init(
            jax.random.PRNGKey(0), l, r, iters=1, train=init_train
        )
    )(batch["img_left"][:1], batch["img_right"][:1])
    tx = optax.amsgrad(1e-4)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(model, tx, loss_name, iters=2)
    sharded_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.copy(x), parallel.replicated(mesh)), state
    )
    _, m1 = step(state, batch)
    sharded_batch = parallel.shard_batch(
        {k: np.asarray(v) for k, v in batch.items()}, mesh
    )
    state2, m2 = step(sharded_state, sharded_batch)
    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=rtol)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert bool(jnp.isfinite(leaf).all())


def test_spmd_mesh_train_step_raft():
    """Family B under the data mesh (round-4 verdict item 4): the
    BatchNorm context net's batch statistics are computed GLOBALLY by XLA
    under the sharded batch (README deviation #4), and the instance-norm
    feature net is per-sample — so the row-sharded loss must equal the
    single-device loss."""
    from stereoformer_tpu.models import RAFTStereo

    rng = np.random.RandomState(3)
    B, H, W = 8, 32, 64
    batch = {
        "img_left": jnp.asarray(
            rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "img_right": jnp.asarray(
            rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "gt_disp": jnp.asarray(
            rng.uniform(0, 48, (B, H, W, 1)).astype(np.float32)),
    }
    # bf16-free tiny config so CPU-mesh numerics are tight
    model = RAFTStereo(hidden_dims=(16, 16, 16))
    _spmd_loss_parity(model, "sequence", batch)


def test_spmd_mesh_train_step_cross_attention():
    """Family C under the data mesh (round-4 verdict item 4)."""
    from stereoformer_tpu.models import CrossAttentionStereo

    rng = np.random.RandomState(4)
    B, H, W = 8, 32, 64
    batch = {
        "img_left": jnp.asarray(
            rng.randn(B, H, W, 3).astype(np.float32)),
        "img_right": jnp.asarray(
            rng.randn(B, H, W, 3).astype(np.float32)),
        "gt_disp": jnp.asarray(
            rng.uniform(0, 48, (B, H, W, 1)).astype(np.float32)),
    }
    model = CrossAttentionStereo(num_heads=4, qk_dim=32, gru_hidden=16)
    _spmd_loss_parity(model, "sequence", batch)


def test_step_schedule():
    sched = make_step_schedule(1e-3, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(199)), 1e-3, rtol=1e-6)  # epoch 19
    np.testing.assert_allclose(float(sched(200)), 5e-4, rtol=1e-6)  # epoch 20


def test_param_freeze_utils():
    from stereoformer_tpu.train import (
        count_parameters,
        freeze_offsets,
        masked_optimizer,
    )
    from stereoformer_tpu.models import LowCNN

    model = LowCNN(refinement="learned")  # has DeformConv -> offset_mask
    left = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, train=False)
    params = variables["params"]
    n = count_parameters(params)
    assert n > 1e6

    tx = freeze_offsets(optax.sgd(1.0), params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = jax.flatten_util.ravel_pytree
    from flax import traverse_util

    fu = traverse_util.flatten_dict(updates)
    frozen = [k for k in fu if "offset_mask" in "/".join(map(str, k))]
    trained = [k for k in fu if "offset_mask" not in "/".join(map(str, k))]
    assert frozen and trained
    assert all(float(jnp.abs(fu[k]).sum()) == 0 for k in frozen)
    assert all(float(jnp.abs(fu[k]).sum()) > 0 for k in trained)


def test_remat_train_step():
    """remat=True (jax.checkpoint) produces the same loss/grads."""
    model = LowCNN(refinement="gru")
    left = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, iters=2, train=False)
    tx = optax.amsgrad(1e-3)

    def mk(remat):
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(variables["params"]),
        )
        return state, make_train_step(model, tx, "sequence", iters=2, remat=remat)

    batch = _dummy_batch(B=1)
    s0, step0 = mk(False)
    s1, step1 = mk(True)
    _, m0 = step0(s0, batch)
    _, m1 = step1(s1, batch)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m0["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4
    )


def test_determinism_same_seed():
    """Same init seed + same batch → identical first-step loss."""
    losses_seen = []
    for _ in range(2):
        _, state, step = _tiny_setup()
        batch = _dummy_batch()
        _, m = step(state, batch)
        losses_seen.append(float(m["loss"]))
    assert losses_seen[0] == losses_seen[1]


def test_freeze_bn_train_step():
    """freeze_bn (raft_stereo.py:124-127): batch statistics are frozen —
    bit-identical after the step — while params still update, and the
    loss equals the plain step's loss computed in eval-BN mode."""
    model = LowCNN(refinement="fixed")
    left = jnp.zeros((2, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, iters=2,
                           train=False)
    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(model, tx, "single", iters=2, freeze_bn=True)
    batch = _dummy_batch()
    # train_step donates its input state: keep host copies for comparison
    # and a second device copy for the control step
    ref_stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    ref_params = jax.tree_util.tree_map(np.asarray, state.params)
    state2 = jax.tree_util.tree_map(jnp.array, state)
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0
    # stats bit-identical; params changed
    for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                    jax.tree_util.tree_leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(a, np.asarray(b))
    moved = any(
        float(np.max(np.abs(a - np.asarray(b)))) > 0
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(new_state.params))
    )
    assert moved
    # a plain train step at the same state updates the stats (control)
    plain = make_train_step(model, tx, "single", iters=2)
    st2, _ = plain(state2, batch)
    changed = any(
        float(np.max(np.abs(a - np.asarray(b)))) > 0
        for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                        jax.tree_util.tree_leaves(st2.batch_stats))
    )
    assert changed
