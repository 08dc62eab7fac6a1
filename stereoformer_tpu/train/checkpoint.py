"""Checkpoint save / restore with best-metric tracking.

Reference behaviour (train_low.py:19-22, 68-74 + utils/utils.py:43-113):
save every epoch named ``{net}_{round}_{epoch}_{EPE:.3f}`` plus a
``model_best`` copy; resume-latest by scob of saved names.  Here the full
TrainState (params + optimizer moments + step) is saved — the reference's
active path saved model-only and silently restarted Adam moments
(SURVEY §5), which this fixes.

Uses orbax's PyTreeCheckpointer (the TPU-standard checkpoint layer).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Optional

from .state import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# async save machinery: one in-flight save at a time; the pending meta /
# best-copy are materialised when the save lands (at the next save or at
# finalize) — orbax renames its temp dir into place, so nothing may touch
# the target path until then
_async_cp = None
_pending: list[tuple[str, bool, str, dict]] = []  # (path, is_best, dir, meta)


def _async_checkpointer():
    global _async_cp
    if _async_cp is None:
        import orbax.checkpoint as ocp

        _async_cp = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_cp


def _drain_pending():
    """Wait for the in-flight save, write its meta, materialise best-copy."""
    global _pending
    if _async_cp is not None:
        _async_cp.wait_until_finished()
    for path, is_best, ckpt_dir, meta in _pending:
        if not os.path.exists(path):
            continue
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        if is_best:
            best = os.path.join(ckpt_dir, "model_best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
    _pending = []


def finalize_checkpoints():
    """Block until every async save has landed (call at end of training)."""
    _drain_pending()


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    net_name: str,
    round_idx: int,
    epoch: int,
    val_epe: float,
    is_best: bool,
    use_async: bool = True,
) -> str:
    """Save ``{net}_{round}_{epoch}_{epe:.3f}`` (+ ``model_best`` copy).

    ``use_async=True`` (default) overlaps the serialisation with the next
    epoch's compute (a sync 18M-param save costs ~13 s through this
    filesystem); at most one save is in flight and ``finalize_checkpoints``
    (or the next save) joins it.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"{net_name}_{round_idx}_{epoch}_{val_epe:.3f}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if os.path.exists(path):
        shutil.rmtree(path)
    meta = {
        "round": round_idx, "epoch": epoch, "arch": net_name,
        "best_EPE": val_epe, "step": int(state.step),
    }
    if use_async:
        _drain_pending()
        cp = _async_checkpointer()
        cp.save(path, state)
        _pending.append((path, is_best, ckpt_dir, meta))
        return path
    cp = _checkpointer()
    cp.save(path, state)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if is_best:
        best = os.path.join(ckpt_dir, "model_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def restore_checkpoint(
    path: str, target: TrainState, shardings=None
) -> TrainState:
    """Restore into the shape/dtype structure of ``target``.

    ``shardings``: optional pytree of ``jax.sharding.Sharding`` matching
    ``target`` (e.g. ``parallel.fsdp_shardings(state, mesh)``).  When
    given, orbax restores each leaf DIRECTLY into its ``NamedSharding``
    — every device materialises only its 1/n shard — instead of loading
    the full array replicated and re-sharding afterwards.  For an FSDP
    resume (~4×-params amsgrad state) that kills both the per-host
    restore memory spike and orbax's "Sharding info not provided …
    unsafe when restoring on a different topology" warning.  Reference
    analogue: checkpoint load, utils/utils.py:73-100 (which has no
    sharding concept — DataParallel state is always replicated).

    Pre-round-2 checkpoints (unfused GRU gate convs) fail the structure
    match; they are raw-restored and migrated — params, batch_stats AND
    amsgrad moments — via ``migrate_gate_fusion``, so ``--pretrain`` /
    ``--resume`` from an old checkpoint continues training losslessly
    instead of silently starting fresh (the migration path restores on
    host, then places to ``shardings`` if given)."""
    import jax

    cp = _checkpointer()
    if shardings is None:
        # Default to each target leaf's CURRENT sharding (the trainer has
        # already placed the state — replicated on the mesh, or on the
        # single device).  Orbax then restores each array directly into
        # place instead of warning "Sharding info not provided … unsafe
        # when restoring on a different topology" and guessing.
        leaf_sh = [
            getattr(x, "sharding", None)
            for x in jax.tree_util.tree_leaves(target)
        ]
        if leaf_sh and all(s is not None for s in leaf_sh):
            shardings = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(target), leaf_sh
            )
    try:
        if shardings is not None:
            import orbax.checkpoint as ocp

            restore_args = ocp.checkpoint_utils.construct_restore_args(
                target, shardings
            )
            return cp.restore(
                os.path.abspath(path), item=target, restore_args=restore_args
            )
        return cp.restore(os.path.abspath(path), item=target)
    except Exception:
        pass  # structure mismatch — try the legacy-layout migration
    raw = cp.restore(os.path.abspath(path))
    migrated = {
        "step": raw["step"],
        "params": migrate_gate_fusion(raw["params"]),
        "batch_stats": raw["batch_stats"],
        "opt_state": migrate_gate_fusion(raw["opt_state"]),
    }
    out = {}
    for field in ("params", "batch_stats", "opt_state"):
        tgt = getattr(target, field)
        tdef = jax.tree_util.tree_structure(tgt)
        leaves = jax.tree_util.tree_leaves(migrated[field])
        tleaves = jax.tree_util.tree_leaves(tgt)
        shapes = [getattr(l, "shape", ()) for l in leaves]
        tshapes = [getattr(l, "shape", ()) for l in tleaves]
        if shapes != tshapes:
            raise ValueError(
                f"checkpoint {path!r} does not match the model even after "
                f"gate-fusion migration ({field}: {len(leaves)} leaves "
                f"vs target {len(tleaves)}; first shape mismatch at "
                f"{next((i for i, (a, b) in enumerate(zip(shapes, tshapes)) if a != b), 'count')})"
            )
        out[field] = jax.tree_util.tree_unflatten(tdef, leaves)
    state = TrainState(
        step=jnp_asarray_like(raw["step"], target.step),
        params=out["params"],
        batch_stats=out["batch_stats"],
        opt_state=out["opt_state"],
    )
    if shardings is not None:
        state = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return state


def jnp_asarray_like(x, like):
    import jax.numpy as jnp

    return jnp.asarray(x, getattr(like, "dtype", None))


def migrate_gate_fusion(tree):
    """Rewrite unfused-GRU-gate checkpoints into the fused layout.

    Round 2 fused each GRU cell's two same-input gate convs into one
    double-width conv (nn/gru.py: conv_z+conv_b → conv_zb with z in the
    first half; nn/raft/update.py: convz{,1,2}+convr{,1,2} → convzr*).
    The fused kernel/bias is exactly the channel-concatenation of the
    unfused pair, so older checkpoints load losslessly.  Works on any
    pytree whose dict nodes use the gate names — params and optimizer
    moments alike.  Identity on already-fused trees."""
    import jax.numpy as jnp

    pairs = (
        ("conv_z", "conv_b", "conv_zb"),
        ("convz", "convr", "convzr"),
        ("convz1", "convr1", "convzr1"),
        ("convz2", "convr2", "convzr2"),
    )

    def merge(a, b):
        if isinstance(a, dict):
            return {k: merge(a[k], b[k]) for k in a}
        return jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=-1)

    def rec(node):
        if isinstance(node, (list, tuple)):
            # optimizer chains/namedtuple states (raw orbax restores
            # tuples as lists) — recurse, preserving the container type
            vals = [rec(v) for v in node]
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*vals)
            return type(node)(vals) if isinstance(node, list) else tuple(vals)
        if not isinstance(node, dict):
            return node
        out = {k: rec(v) for k, v in node.items()}
        for za, zb, fused in pairs:
            if za in out and zb in out and fused not in out:
                out[fused] = merge(out.pop(za), out.pop(zb))
        return out

    return rec(tree)


def restore_params(path: str, target: TrainState) -> TrainState:
    """Restore only step/params/batch_stats, keeping ``target``'s optimizer
    state — for evaluation/analysis or when the optimizer configuration
    changed between save and load (mirrors the reference's state_dict-only
    loading, utils/utils.py:73-100).  Pre-round-2 unfused-gate checkpoints
    are migrated transparently (``migrate_gate_fusion``)."""
    cp = _checkpointer()
    raw = cp.restore(os.path.abspath(path))
    return TrainState(
        step=raw["step"],
        params=migrate_gate_fusion(raw["params"]),
        batch_stats=raw["batch_stats"],
        opt_state=target.opt_state,
    )


def checkpoint_meta(path: str) -> dict:
    """round/epoch/… for a checkpoint: meta.json when present, else parsed
    from the ``{net}_{round}_{epoch}_{epe}`` directory name (the async
    path writes meta on landing, so a crash can leave it absent)."""
    try:
        with open(os.path.join(path, "meta.json")) as f:
            return json.load(f)
    except Exception:
        m = re.search(r"_(\d+)_(\d+)_([0-9.]+)$", os.path.basename(path))
        if m:
            return {
                "round": int(m.group(1)),
                "epoch": int(m.group(2)),
                "best_EPE": float(m.group(3).rstrip(".")),
            }
        return {}


def _is_complete_checkpoint(path: str) -> bool:
    # orbax writes to "<name>.orbax-checkpoint-tmp-*" and renames on
    # completion — temp dirs must never be resumed from
    return os.path.isdir(path) and ".orbax-checkpoint-tmp" not in path


def latest_checkpoint(ckpt_dir: str, net_name: str) -> Optional[str]:
    """Resume-latest glob (utils/utils.py:103-113 semantics): highest
    (round, epoch) among *completed* saved checkpoints."""
    pat = os.path.join(ckpt_dir, f"{net_name}_*_*_*")
    best: tuple[int, int] = (-1, -1)
    best_path = None
    for p in glob.glob(pat):
        if not _is_complete_checkpoint(p):
            continue
        m = re.fullmatch(
            rf"{re.escape(net_name)}_(\d+)_(\d+)_[0-9.]+",
            os.path.basename(p),
        )
        if m:
            key = (int(m.group(1)), int(m.group(2)))
            if key > best:
                best, best_path = key, p
    return best_path
