"""Learning-rate schedules.

``reference_lr`` reproduces trainer_DLC_GRU.py:136-146 exactly:
constant for epochs 0..19, then lr / ((epoch − 10) // 10 · 2):
epochs 20-29 → lr/2, 30-39 → lr/4, 40-49 → lr/6, ...
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_lr(base_lr: float, epoch):
    """Per-epoch LR of the reference trainer (works on ints and traced
    arrays)."""
    epoch = jnp.asarray(epoch)
    times = (epoch - 10) // 10 * 2
    return jnp.where(epoch > 19, base_lr / jnp.maximum(times, 1), base_lr)


def make_step_schedule(base_lr: float, steps_per_epoch: int):
    """optax-compatible schedule: step count → reference per-epoch LR."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return reference_lr(base_lr, epoch)

    return schedule
