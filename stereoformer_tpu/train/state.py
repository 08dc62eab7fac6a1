"""Training state: a pure pytree (checkpoint-friendly, shard-friendly)."""

from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    step: Any            # int32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any
