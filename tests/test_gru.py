"""Fused-gate ConvGRU parity: the z/b (and z/r) gate convs of each GRU
cell are fused into one wide conv for MXU tile width (nn/gru.py,
nn/raft/update.py).  These tests prove the fusion is bit-identical to the
reference's two-conv formulation (Attempts/update.py:17-49,
IterativeLocalCostVolume/update/update.py:16-63) by recomputing the
unfused form from slices of the fused kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereoformer_tpu.nn import ConvGRU, SepConvGRU
from stereoformer_tpu.nn.gru import stacked_init, stacked_orthogonal
from stereoformer_tpu.nn.raft.update import ContextConvGRU


def _conv2d(x, kernel, bias=None, pad=1):
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(pad, pad)] * 2 if isinstance(pad, int) else pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if bias is None else out + bias


def test_convgru_fused_equals_unfused():
    hid = 8
    cell = ConvGRU(hidden_dim=hid)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 7, 12), jnp.float32)
    h = jnp.asarray(np.random.RandomState(1).randn(2, 6, 7, hid), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), x, h)
    out = cell.apply(params, x, h)

    p = params["params"]
    kzb = p["conv_zb"]["kernel"]
    bzb = p["conv_zb"]["bias"]
    xh = jnp.concatenate([x, h], axis=-1)
    z = jax.nn.sigmoid(_conv2d(xh, kzb[..., :hid], bzb[:hid]))
    b = jax.nn.sigmoid(_conv2d(xh, kzb[..., hid:], bzb[hid:]))
    s = jnp.concatenate([b * h, x], axis=-1)
    g = jnp.tanh(_conv2d(s, p["conv_g"]["kernel"], p["conv_g"]["bias"]))
    ref = (1.0 - z) * h + z * g
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_convgru_none_hidden_zero_init():
    cell = ConvGRU(hidden_dim=4)
    x = jnp.ones((1, 4, 4, 6))
    params = cell.init(jax.random.PRNGKey(0), x, None)
    out_none = cell.apply(params, x, None)
    out_zero = cell.apply(params, x, jnp.zeros((1, 4, 4, 4)))
    np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_zero))


def test_sepconvgru_fused_equals_unfused():
    hid = 8
    cell = SepConvGRU(hidden_dim=hid)
    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.randn(2, 5, 6, hid), jnp.float32)
    x = jnp.asarray(rng.randn(2, 5, 6, 10), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), h, x)
    out = cell.apply(params, h, x)

    p = params["params"]

    def gated(h, x, suffix, pad):
        zr_k = p["convzr" + suffix]["kernel"]
        zr_b = p["convzr" + suffix]["bias"]
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(_conv2d(hx, zr_k[..., :hid], zr_b[:hid], pad=pad))
        r = jax.nn.sigmoid(_conv2d(hx, zr_k[..., hid:], zr_b[hid:], pad=pad))
        q = jnp.tanh(
            _conv2d(jnp.concatenate([r * h, x], axis=-1),
                    p["convq" + suffix]["kernel"],
                    p["convq" + suffix]["bias"], pad=pad)
        )
        return (1 - z) * h + z * q

    ref = gated(h, x, "1", [(0, 0), (2, 2)])
    ref = gated(ref, x, "2", [(2, 2), (0, 0)])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_context_convgru_fused_equals_unfused():
    hid = 8
    cell = ContextConvGRU(hidden_dim=hid)
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(2, 5, 6, hid), jnp.float32)
    ctx = tuple(jnp.asarray(rng.randn(2, 5, 6, hid), jnp.float32)
                for _ in range(3))
    inp = jnp.asarray(rng.randn(2, 5, 6, 9), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), h, ctx, inp)
    out = cell.apply(params, h, ctx, inp)

    p = params["params"]
    kzr, bzr = p["convzr"]["kernel"], p["convzr"]["bias"]
    cz, cr, cq = ctx
    hx = jnp.concatenate([h, inp], axis=-1)
    z = jax.nn.sigmoid(_conv2d(hx, kzr[..., :hid], bzr[:hid]) + cz)
    r = jax.nn.sigmoid(_conv2d(hx, kzr[..., hid:], bzr[hid:]) + cr)
    q = jnp.tanh(
        _conv2d(jnp.concatenate([r * h, inp], axis=-1),
                p["convq"]["kernel"], p["convq"]["bias"]) + cq
    )
    ref = (1 - z) * h + z * q
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_migrate_gate_fusion_roundtrip():
    """A pre-round-2 checkpoint (separate conv_z/conv_b, convz*/convr*)
    must migrate losslessly into the fused layout, including nested
    optimizer-moment-style trees."""
    from stereoformer_tpu.train import migrate_gate_fusion

    hid = 8
    cell = ConvGRU(hidden_dim=hid)
    x = jnp.ones((1, 4, 4, 6))
    params = cell.init(jax.random.PRNGKey(0), x, None)["params"]

    # synthesize the legacy layout by splitting the fused conv
    def split(tree):
        zb = tree.pop("conv_zb")
        tree["conv_z"] = {k: v[..., :hid] for k, v in zb.items()}
        tree["conv_b"] = {k: v[..., hid:] for k, v in zb.items()}
        return tree

    legacy = split(dict(params))
    migrated = migrate_gate_fusion({"wrap": legacy})["wrap"]
    assert set(migrated) == set(params)
    for a, b in zip(jax.tree_util.tree_leaves(migrated),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = cell.apply({"params": migrated}, x, None)
    ref = cell.apply({"params": params}, x, None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # SepConvGRU per-direction names and raw-array leaves (opt-state style)
    leg = {
        "convz1": np.ones((3, 4)), "convr1": np.zeros((3, 4)),
        "convq1": np.ones((3, 4)),
        "convz": np.full((2,), 2.0), "convr": np.full((2,), 3.0),
    }
    m = migrate_gate_fusion(leg)
    assert set(m) == {"convzr1", "convq1", "convzr"}
    assert m["convzr1"].shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(m["convzr"]),
                                  np.asarray([2.0, 2.0, 3.0, 3.0]))
    # identity on already-fused trees
    again = migrate_gate_fusion(m)
    assert set(again) == set(m)


def test_stacked_orthogonal_slices_are_orthogonal():
    # each fused-kernel slice must itself be orthogonal (reference init
    # semantics: orthogonal per gate, Attempts/update.py:22-28)
    init = stacked_orthogonal(2)
    k = init(jax.random.PRNGKey(0), (3, 3, 16, 8), jnp.float32)
    for sl in (k[..., :4], k[..., 4:]):
        m = np.asarray(sl).reshape(-1, 4)  # flattened fan-in × fan-out
        np.testing.assert_allclose(m.T @ m, np.eye(4), atol=1e-5)
    # and the two slices are independent draws, not copies
    assert not np.allclose(np.asarray(k[..., :4]), np.asarray(k[..., 4:]))


def test_stacked_init_matches_base_distribution():
    base = jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")
    k = stacked_init(base, 2)(jax.random.PRNGKey(1), (3, 3, 32, 64))
    # per-slice std must match fan_out of the HALF width (32), not 64
    expect = np.sqrt(2.0 / (3 * 3 * 32))
    for sl in (k[..., :32], k[..., 32:]):
        assert abs(float(jnp.std(sl)) - expect) / expect < 0.1


def test_restore_checkpoint_migrates_legacy_layout(tmp_path):
    """A pre-fusion checkpoint (split conv_z/conv_b in params AND amsgrad
    moments) must restore through restore_checkpoint into the fused
    target losslessly — the --pretrain/--resume path, not just
    restore_params."""
    import optax

    from stereoformer_tpu.train import TrainState
    from stereoformer_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint, finalize_checkpoints,
    )

    hid = 4
    cell = ConvGRU(hidden_dim=hid)
    x = jnp.ones((1, 4, 4, 6))
    params = cell.init(jax.random.PRNGKey(0), x, None)["params"]
    tx = optax.amsgrad(1e-3)
    fused = TrainState(
        step=jnp.asarray(7, jnp.int32), params=params, batch_stats={},
        opt_state=tx.init(params),
    )

    def split(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "conv_zb":
                out["conv_z"] = {kk: vv[..., :hid] for kk, vv in v.items()}
                out["conv_b"] = {kk: vv[..., hid:] for kk, vv in v.items()}
            else:
                out[k] = split(v)
        return out

    legacy = TrainState(
        step=fused.step,
        params=split(params),
        batch_stats={},
        opt_state=_split_opt(fused.opt_state, split),
    )
    path = save_checkpoint(str(tmp_path), legacy, "legacy", 0, 0, 1.0,
                           is_best=False, use_async=False)
    finalize_checkpoints()

    restored = restore_checkpoint(path, fused)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(fused.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(fused.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state is consumable: one optimizer update runs
    import optax as _ox
    g = jax.tree_util.tree_map(jnp.ones_like, fused.params)
    _ox.amsgrad(1e-3).update(g, restored.opt_state, restored.params)


def _split_opt(opt_state, split):
    """Apply the param-tree split inside each amsgrad moment tree."""
    def rec(node):
        if isinstance(node, dict):
            return split(node)
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(**{f: rec(getattr(node, f)) for f in node._fields})
        if isinstance(node, tuple):
            return tuple(rec(n) for n in node)
        return node
    return rec(opt_state)
