"""Import reference PyTorch ``.pth`` checkpoints into this framework.

The reference deploys trained weights as torch ``state_dict`` files
(``train_low.py:86-99`` loads them into the live module).  A user
migrating from the reference brings those files along; this module maps
them onto the Flax parameter tree of the matching model family:

- torch ``Conv2d.weight`` [O, I, kh, kw]  →  flax ``kernel`` [kh, kw, I, O]
- torch ``BatchNorm2d`` weight/bias/running_mean/running_var →
  ``scale``/``bias`` params + ``batch_stats`` mean/var
  (``num_batches_tracked`` is dropped — flax keeps no step counter)
- the reference's two separate z/b gate convs over the same ``[x, h]``
  input (``Attempts/update.py:17-49``) map onto our fused ``conv_zb``
  by concatenation along the output axis (bit-identical math — a conv
  is independent per output channel; see nn/gru.py); the reference's
  ``conv_zz.0``/``conv_bb.0``/``conv_gg.0`` keys are Sequential ALIASES
  of ``conv_z``/``conv_b``/``conv_g`` (same tensors) and are consumed
  as duplicates.

Covered: the LowCNN family (``baseline_dynamic_gru.py`` — the
reference's production-trained family per ``scripts/run.sh`` — plus the
``baseline.py`` variants sharing its backbone) and the RAFT-Stereo
family (``IterativeLocalCostVolume/raft_stereo.py``).  Forward parity
of every imported tree is tested against the reference model itself
running on torch-CPU (tests/test_torch_import.py): the non-warp paths —
the whole LowCNN pre-refinement stack, the fixed-variant end-to-end,
and the ENTIRE RAFT eval forward — match to float tolerance
(1e-5..2e-4 px max); the LowCNN GRU head is compared under the
documented warp deviation (README deviation #2).

Works on plain numpy — no torch import needed here; ``cli/import_torch``
handles ``.pth`` deserialisation.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = ["convert_lowcnn_state_dict", "convert_raft_state_dict"]


def _np(t) -> np.ndarray:
    """torch tensor / numpy array → float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd, key, out, path, bias=True):
    w = _np(sd.pop(key + ".weight"))
    node = out["params"]
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node = node.setdefault(path[-1], {})
    node["kernel"] = np.transpose(w, (2, 3, 1, 0))
    if bias:
        node["bias"] = _np(sd.pop(key + ".bias"))


def _bn(sd, key, out, path):
    pnode = out["params"]
    snode = out["batch_stats"]
    for p in path[:-1]:
        pnode = pnode.setdefault(p, {})
        snode = snode.setdefault(p, {})
    pnode = pnode.setdefault(path[-1], {})
    snode = snode.setdefault(path[-1], {})
    pnode["scale"] = _np(sd.pop(key + ".weight"))
    pnode["bias"] = _np(sd.pop(key + ".bias"))
    snode["mean"] = _np(sd.pop(key + ".running_mean"))
    snode["var"] = _np(sd.pop(key + ".running_var"))
    sd.pop(key + ".num_batches_tracked", None)


def _resblock(sd, key, out, name, shortcut: bool):
    """Reference ResBlock (BasicBlocks/resnet.py): conv1/bn1/conv2/bn2
    (+ shortcut conv/bn) → our nn.ResBlock.  Flax auto-numbers norms in
    CALL order and the shortcut branch runs first (nn/blocks.py), so
    with a shortcut the shortcut's norm is ``BatchNorm_0`` and
    bn1/bn2 land on ``BatchNorm_1``/``BatchNorm_2``."""
    off = 1 if shortcut else 0
    _conv(sd, f"{key}.conv1", out, (name, "Conv_0"))
    _bn(sd, f"{key}.bn1", out, (name, f"BatchNorm_{off}"))
    _conv(sd, f"{key}.conv2", out, (name, "Conv_1"))
    _bn(sd, f"{key}.bn2", out, (name, f"BatchNorm_{off + 1}"))
    if shortcut:
        _conv(sd, f"{key}.shortcut.0", out, (name, "shortcut_conv"))
        _bn(sd, f"{key}.shortcut.1", out, (name, "BatchNorm_0"))


def convert_lowcnn_state_dict(
    state_dict: Mapping[str, object], refinement: str = "gru",
    strict: bool = True,
) -> dict:
    """Reference ``LowCNN`` state_dict → ``{"params": …, "batch_stats": …}``
    for ``models.LowCNN(refinement=…)``.

    ``strict`` raises if any source key is left unconsumed (protects
    against silently dropping weights of an unrecognised head).
    """
    sd = dict(state_dict)
    out: dict = {"params": {}, "batch_stats": {}}

    # ---- shared backbone (baseline_dynamic_gru.py:45-66) --------------
    _conv(sd, "conv1.0", out, ("ConvLReLU_0", "Conv_0"))
    _resblock(sd, "conv2", out, "ResBlock_0", shortcut=True)
    _resblock(sd, "conv3", out, "ResBlock_1", shortcut=True)
    _resblock(sd, "downsample1", out, "ResBlock_2", shortcut=False)
    _resblock(sd, "downsample2", out, "ResBlock_3", shortcut=True)
    _resblock(sd, "downsample3", out, "ResBlock_4", shortcut=True)
    for i in range(2):
        _conv(sd, f"feature_concated.layer_list.{i}.conv", out,
              ("FPNFusion_0", f"ConvBnRelu_{i}", "Conv_0"), bias=False)
        _bn(sd, f"feature_concated.layer_list.{i}.bn", out,
            ("FPNFusion_0", f"ConvBnRelu_{i}", "BatchNorm_0"))
    for i in range(3):
        _resblock(sd, f"correlation_aggreagtion.{i}", out, f"agg{i}",
                  shortcut=False)

    # ---- refinement heads ---------------------------------------------
    if refinement in ("none", "fixed", "variance"):
        # baseline.py / baseline_var.py: shared ConvAffinityUpsample mask
        # head (upsample.py:6-19); the fixed/variance refiners themselves
        # are parameter-free resamplers
        if "upsample_mask.upsample_mask.0.weight" in sd:
            _conv(sd, "upsample_mask.upsample_mask.0", out,
                  ("ConvAffinityUpsample_0", "Conv_0"))
            _conv(sd, "upsample_mask.upsample_mask.2", out,
                  ("ConvAffinityUpsample_0", "Conv_1"))
    if refinement in ("gru", "gru_feature"):
        g = "gru_update"
        _conv(sd, "local_cost_volume.encoder.uncertain_encoder.0", out,
              (g, "GuidanceEncoder_0", "uncertain_encoder"), bias=False)
        _bn(sd, "local_cost_volume.encoder.uncertain_encoder.1", out,
            (g, "GuidanceEncoder_0", "uncertain_encoder_bn"))
        _conv(sd, "local_cost_volume.encoder.disparity_error_encoder.0",
              out, (g, "GuidanceEncoder_0", "error_encoder"), bias=False)
        _bn(sd, "local_cost_volume.encoder.disparity_error_encoder.1", out,
            (g, "GuidanceEncoder_0", "error_encoder_bn"))
        # fused z|b gate conv (output-axis concat; see module docstring)
        wz = np.transpose(_np(sd.pop("local_cost_volume.gru.conv_z.weight")),
                          (2, 3, 1, 0))
        wb = np.transpose(_np(sd.pop("local_cost_volume.gru.conv_b.weight")),
                          (2, 3, 1, 0))
        bz = _np(sd.pop("local_cost_volume.gru.conv_z.bias"))
        bb = _np(sd.pop("local_cost_volume.gru.conv_b.bias"))
        gru = out["params"].setdefault(g, {}).setdefault("ConvGRU_0", {})
        gru["conv_zb"] = {
            "kernel": np.concatenate([wz, wb], axis=-1),
            "bias": np.concatenate([bz, bb], axis=0),
        }
        _conv(sd, "local_cost_volume.gru.conv_g", out,
              (g, "ConvGRU_0", "conv_g"))
        # conv_zz.0/conv_bb.0/conv_gg.0 are Sequential aliases of the
        # tensors consumed above — drop the duplicate keys
        for alias in ("conv_zz", "conv_bb", "conv_gg"):
            sd.pop(f"local_cost_volume.gru.{alias}.0.weight", None)
            sd.pop(f"local_cost_volume.gru.{alias}.0.bias", None)
        _conv(sd, "local_cost_volume.offset.conv1", out,
              (g, "OffsetHead_0", "Conv_0"))
        _conv(sd, "local_cost_volume.offset.conv2", out,
              (g, "OffsetHead_0", "Conv_1"))
        _conv(sd, "local_cost_volume.mask.0", out, (g, "mask_conv1"))
        _conv(sd, "local_cost_volume.mask.2", out, (g, "mask_conv2"))

    if strict and sd:
        raise ValueError(
            f"unconsumed reference keys (unknown head for "
            f"refinement={refinement!r}?): {sorted(sd)[:10]}"
            + ("…" if len(sd) > 10 else "")
        )
    return out


def _raft_block(sd, key, out, name, shortcut: bool, norm: str):
    """Reference extractor ResidualBlock (extractor.py:6-60) → our
    RaftResidualBlock.  Our norms are auto-numbered in declaration order
    (_Norm_0 = norm1, _Norm_1 = norm2, _Norm_2 = the shortcut's norm3 —
    the OPPOSITE convention of nn.ResBlock, see _resblock); torch's
    ``downsample.1`` entries are Sequential ALIASES of ``norm3``."""
    name = tuple(name) if isinstance(name, tuple) else (name,)
    _conv(sd, f"{key}.conv1", out, (*name, "Conv_0"))
    _conv(sd, f"{key}.conv2", out, (*name, "Conv_1"))
    bn = norm == "batch"
    if bn:
        _bn(sd, f"{key}.norm1", out, (*name, "_Norm_0", "BatchNorm_0"))
        _bn(sd, f"{key}.norm2", out, (*name, "_Norm_1", "BatchNorm_0"))
    if shortcut:
        _conv(sd, f"{key}.downsample.0", out, (*name, "downsample"))
        if bn:
            _bn(sd, f"{key}.norm3", out, (*name, "_Norm_2", "BatchNorm_0"))
            for suffix in ("weight", "bias", "running_mean", "running_var",
                           "num_batches_tracked"):
                sd.pop(f"{key}.downsample.1.{suffix}", None)


def convert_raft_state_dict(
    state_dict: Mapping[str, object], strict: bool = True
) -> dict:
    """Reference ``RAFT_Stereo`` (IterativeLocalCostVolume/raft_stereo.py)
    state_dict → variables for ``models.RAFTStereo``.

    Instance norms (fnet) carry no parameters on either side; the z/r
    gate convs of each ContextConvGRU fuse into ``convzr`` by output
    concat (nn/raft/update.py)."""
    sd = dict(state_dict)
    out: dict = {"params": {}, "batch_stats": {}}

    # fnet (instance norm): conv1 / layer1-3 / conv2 ---------------------
    _conv(sd, "fnet.conv1", out, ("fnet", "Conv_0"))
    for n in (1, 2, 3):
        _raft_block(sd, f"fnet.layer{n}.0", out, ("fnet", f"layer{n}a"),
                    shortcut=n > 1, norm="instance")
        _raft_block(sd, f"fnet.layer{n}.1", out, ("fnet", f"layer{n}b"),
                    shortcut=False, norm="instance")
    _conv(sd, "fnet.conv2", out, ("fnet", "Conv_1"))

    # cnet (batch norm): conv1/norm1, layer1-3, layer4-5 = down1-2,
    # per-scale output heads ---------------------------------------------
    _conv(sd, "cnet.conv1", out, ("cnet", "Conv_0"))
    _bn(sd, "cnet.norm1", out, ("cnet", "_Norm_0", "BatchNorm_0"))
    for n, ours in ((1, "layer1"), (2, "layer2"), (3, "layer3"),
                    (4, "down1"), (5, "down2")):
        _raft_block(sd, f"cnet.layer{n}.0", out, ("cnet", f"{ours}a"),
                    shortcut=n > 1, norm="batch")
        _raft_block(sd, f"cnet.layer{n}.1", out, ("cnet", f"{ours}b"),
                    shortcut=False, norm="batch")
    # outputs08/16 (finest two scales, res+conv heads), outputs32 (conv)
    for tscale, lvl in (("08", 0), ("16", 1)):
        for h in range(2):
            _raft_block(sd, f"cnet.outputs{tscale}.{h}.0", out,
                        ("cnet", f"out{lvl}_{h}_res"), shortcut=False,
                        norm="batch")
            _conv(sd, f"cnet.outputs{tscale}.{h}.1", out,
                  ("cnet", f"out{lvl}_{h}_conv"))
    for h in range(2):
        _conv(sd, f"cnet.outputs32.{h}", out, ("cnet", f"out2_{h}_conv"))

    # update block --------------------------------------------------------
    for tname, oname in (("convc1", "Conv_0"), ("convc2", "Conv_1"),
                         ("convf1", "Conv_2"), ("convf2", "Conv_3"),
                         ("conv", "Conv_4")):
        _conv(sd, f"update_block.encoder.{tname}", out,
              ("update_block", "encoder", oname))
    for g in ("gru08", "gru16", "gru32"):
        wz = np.transpose(_np(sd.pop(f"update_block.{g}.convz.weight")),
                          (2, 3, 1, 0))
        wr = np.transpose(_np(sd.pop(f"update_block.{g}.convr.weight")),
                          (2, 3, 1, 0))
        bz = _np(sd.pop(f"update_block.{g}.convz.bias"))
        br = _np(sd.pop(f"update_block.{g}.convr.bias"))
        node = out["params"].setdefault("update_block", {}).setdefault(g, {})
        node["convzr"] = {"kernel": np.concatenate([wz, wr], axis=-1),
                          "bias": np.concatenate([bz, br], axis=0)}
        _conv(sd, f"update_block.{g}.convq", out,
              ("update_block", g, "convq"))
    _conv(sd, "update_block.flow_head.conv1", out,
          ("update_block", "flow_head", "Conv_0"))
    _conv(sd, "update_block.flow_head.conv2", out,
          ("update_block", "flow_head", "Conv_1"))
    _conv(sd, "update_block.mask.0", out, ("update_block", "mask_conv1"))
    _conv(sd, "update_block.mask.2", out, ("update_block", "mask_conv2"))
    for i in range(3):
        _conv(sd, f"context_zqr_convs.{i}", out, (f"context_zqr{i}",))

    if strict and sd:
        raise ValueError(f"unconsumed reference keys: {sorted(sd)[:10]}"
                         + ("…" if len(sd) > 10 else ""))
    return out
