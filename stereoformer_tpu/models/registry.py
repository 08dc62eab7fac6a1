"""Model registry — string names → configured model constructors.

Mirrors the reference's trainer string switch (train_file/
trainer_DLC_GRU.py:95-100 and train_low.py ``--net`` flag) plus explicit
TPU-framework names.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from .low_cnn import LowCNN

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, **overrides):
    """Build a model by registry name.  Unknown names raise with the list
    of available models."""
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**overrides)


def available_models():
    return sorted(_REGISTRY)


# -- LowCNN family (reference names from the trainers' string switches) --

@register("LowCNN")                 # baseline.py via trainer_LC "simple"
def _lowcnn(**kw):
    kw.setdefault("refinement", "fixed")
    return LowCNN(**kw)


@register("LowCNN_simple")
def _lowcnn_simple(**kw):
    kw.setdefault("refinement", "none")
    return LowCNN(**kw)


@register("LowCNN_ada")             # baseline_var.py via trainer_LC "ada"
def _lowcnn_ada(**kw):
    kw.setdefault("refinement", "variance")
    return LowCNN(**kw)


@register("LowCNN_dynamic")         # baseline_dynamic.py
def _lowcnn_dynamic(**kw):
    kw.setdefault("refinement", "learned")
    return LowCNN(**kw)


@register("LowCNN_dynamic_supervised")  # baseline_dynamic_supervised.py via train_DLC
def _lowcnn_dsup(**kw):
    kw.setdefault("refinement", "learned_supervised")
    return LowCNN(**kw)


@register("LowCNN_gru")             # baseline_dynamic_gru.py via trainer_DLC_GRU
def _lowcnn_gru(**kw):
    kw.setdefault("refinement", "gru")
    return LowCNN(**kw)


@register("LowCNN_gru2")            # baseline_dynamic_gru2.py
def _lowcnn_gru2(**kw):
    kw.setdefault("refinement", "gru_feature")
    return LowCNN(**kw)


# -- RAFT-Stereo family (models/IterativeLocalCostVolume) --

@register("RAFT_Stereo")
def _raft(**kw):
    from .raft_stereo import RAFTStereo

    # the shared trainer/eval contract passes max_disp, loop and
    # ImageNet-normalised images; RAFT has no disparity cap, no
    # unroll/scan switch (its GRU cascade is always unrolled) and
    # expects [-1, 1]
    kw.pop("max_disp", None)
    kw.pop("loop", None)
    kw.pop("scan_unroll", None)
    kw.setdefault("input_norm", "imagenet")
    return RAFTStereo(**kw)


# -- Cross-attention family (the capability models/CrossAttentionCostVolume
#    declares; its cross_attention_cost_volume.py is empty upstream) --

@register("CrossAttentionStereo")
def _cross_attention(**kw):
    from .cross_attention import CrossAttentionStereo

    kw.pop("loop", None)  # GRU refinement is always unrolled here
    kw.pop("scan_unroll", None)
    return CrossAttentionStereo(**kw)
