"""Parameter utilities — counting, freezing, selective optimisation.

Reference capability: ``utils/utils.py:43-139`` (count_parameters, the
offset-parameter filters used to freeze/unfreeze the DCN offset convs,
``fix_net_parameters`` / ``train_fix_first``).  In optax the same is a
``multi_transform`` over a name-pattern mask.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from flax import traverse_util


def count_parameters(params) -> int:
    """Total number of scalar parameters (printed at trainer startup,
    trainer_DLC_GRU.py:107)."""
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def param_labels(params, predicate: Callable[[str], bool],
                 true_label: str = "train", false_label: str = "freeze"):
    """Label every leaf by whether its '/'-joined path satisfies
    ``predicate``."""
    flat = traverse_util.flatten_dict(params)
    labels = {
        k: (true_label if predicate("/".join(map(str, k))) else false_label)
        for k in flat
    }
    return traverse_util.unflatten_dict(labels)


def masked_optimizer(
    tx: optax.GradientTransformation,
    params,
    trainable: Callable[[str], bool],
) -> optax.GradientTransformation:
    """Optimise only leaves whose path satisfies ``trainable``; others get
    zero updates (the reference's requires_grad filtering,
    trainer_DLC_GRU.py:127)."""
    labels = param_labels(params, trainable)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def is_offset_param(path: str) -> bool:
    """The deformable-conv offset/mask prediction convs
    (utils/utils.py offset filters; our DeformConv names them
    'offset_mask')."""
    return "offset_mask" in path


def freeze_offsets(tx: optax.GradientTransformation, params):
    """Train everything except DCN offset convs."""
    return masked_optimizer(tx, params, lambda p: not is_offset_param(p))


def only_offsets(tx: optax.GradientTransformation, params):
    """Fine-tune only the DCN offset convs."""
    return masked_optimizer(tx, params, is_offset_param)
