"""Jitted SPMD train / eval step factories.

Replaces the reference trainer's per-batch body
(trainer_DLC_GRU.py:163-228: forward → sequence loss → backward → Adam
step → EPE bookkeeping) with a single compiled function: loss, gradient,
optimizer update, BN-stat update and metrics all fuse into one XLA
program.  Under a data mesh the batch comes in row-sharded and jit
compiles the gradient all-reduce; there is no explicit DataParallel
layer (SURVEY §2.12).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from .. import losses
from ..metrics import thres_metric
from ..ops import scale_disp
from .state import TrainState

LOSS_NAMES = ("sequence", "equal", "single", "range_supervised")


def compute_loss(loss_name: str, out: dict, gt: jnp.ndarray,
                 gamma: float = 0.8, weights: Sequence[float] = (0.8, 1.2)):
    preds = out["disparities"]
    if loss_name == "sequence":
        return losses.sequence_loss(preds, gt, gamma=gamma)
    if loss_name == "equal":
        return losses.multi_equal_loss(preds, gt, weights=weights)
    if loss_name == "single":
        return losses.single_scale_loss(preds[-1], gt)
    if loss_name == "range_supervised":
        lower, upper = out["bounds"]
        return losses.range_and_disparity_loss(
            preds, gt, out["disp_low"], lower, upper, weights=weights
        )
    raise ValueError(f"unknown loss {loss_name!r}; one of {LOSS_NAMES}")


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_name: str = "sequence",
    iters: int = 12,
    gamma: float = 0.8,
    weights: Sequence[float] = (0.8, 1.2),
    remat: bool = False,
    state_out_shardings=None,
    freeze_bn: bool = False,
) -> Callable:
    """Returns jitted ``train_step(state, batch) -> (state, metrics)``.

    ``remat=True`` wraps the forward in ``jax.checkpoint`` to trade
    recompute for memory across the unrolled GRU iterations.

    ``freeze_bn=True`` is the RAFT fine-tune knob
    (models/IterativeLocalCostVolume/raft_stereo.py:124-127 ``freeze_bn``
    → BatchNorm.eval()): every BatchNorm normalises with its running
    statistics and the statistics are not updated, while parameters still
    receive gradients.  Here that is exactly the model's ``train=False``
    path with no mutable collection (BN mode is the only thing ``train``
    gates in these models).

    ``state_out_shardings``: optional pytree of ``NamedSharding`` matching
    ``TrainState`` — pins the updated state's placement (FSDP: params and
    optimizer moments stay sharded over the mesh; XLA all-gathers params
    at use and reduce-scatters the gradients — ``parallel/fsdp.py``).
    Donation then reuses the identically-sharded input buffers.
    """

    def forward(params, batch_stats, left, right):
        if freeze_bn:
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                left, right, iters=iters, train=False,
            )
            return out, {"batch_stats": batch_stats}
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            left, right, iters=iters, train=True, mutable=["batch_stats"],
        )

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, batch):
        out, mutated = forward(
            params, batch_stats, batch["img_left"], batch["img_right"]
        )
        gt = batch["gt_disp"]
        loss = compute_loss(loss_name, out, gt, gamma, weights)
        epe = losses.epe(out["disparities"][-1], gt)
        return loss, (mutated["batch_stats"], epe)

    jit_kwargs = {}
    if state_out_shardings is not None:
        # metrics stay unconstrained (scalars; XLA replicates them)
        jit_kwargs["out_shardings"] = (state_out_shardings, None)

    @functools.partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def train_step(state: TrainState, batch: dict):
        (loss, (new_stats, epe)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "epe": epe, "grad_norm": gnorm}

    return train_step


def make_eval_step(
    model, iters: int = 12, out_size: tuple[int, int] | None = None
) -> Callable:
    """Returns jitted ``eval_step(state, batch) -> metrics``.

    Mirrors validate (trainer_DLC_GRU.py:246-280): forward at the
    (possibly resized) eval resolution, rescale the prediction back to
    the ground truth's native size with ``scale_disp`` (the ×W-ratio
    disparity rescale), then masked EPE + P1.  The rescaled prediction is
    returned under ``"pred"`` (a device array — it costs host bandwidth
    only if the caller materialises it, e.g. for TensorBoard panels).
    """

    @functools.partial(jax.jit, static_argnums=())
    def eval_step(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["img_left"], batch["img_right"], iters=iters, train=False,
        )
        pred = out["disparities"][-1]
        gt = batch["gt_disp"]
        if pred.shape[1:3] != gt.shape[1:3]:
            pred = scale_disp(pred, (gt.shape[1], gt.shape[2]))
        # P1 over gt-valid pixels (the reference's P1 is an unmasked mean,
        # trainer_DLC_GRU.py:273 — masking makes zero-padded batch rows
        # metric-neutral and matches EPE's masking convention)
        return {
            "epe": losses.epe(pred, gt),
            "p1": thres_metric(pred, gt, losses.valid_mask(gt), 1.0),
            "pred": pred,
        }

    return eval_step


def make_infer_fn(model, iters: int = 12) -> Callable:
    """Jitted inference: (state, left, right) -> final disparity
    [B, H, W, 1]."""

    @jax.jit
    def infer(state: TrainState, left, right):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            left, right, iters=iters, train=False,
        )
        return out["disparities"][-1]

    return infer
