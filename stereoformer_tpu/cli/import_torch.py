"""Convert a reference PyTorch ``.pth`` checkpoint to a ``--pretrain``-able
checkpoint of this framework.

Mirrors the reference loader's tolerances (``utils/utils.py:73-100``):
unwraps ``{'state_dict': …}`` containers and strips DataParallel's
``module.`` prefixes, then maps the tensors onto the Flax tree
(``train/torch_import.py``) and writes an orbax checkpoint that
``--pretrain`` restores (params + batch_stats; optimizer moments start
fresh, exactly like the reference's state_dict-only loading).

usage:
  python -m stereoformer_tpu.cli.import_torch model.pth out_ckpt \
      [--net LowCNN_gru]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_REFINEMENT = {
    # registry name -> LowCNN refinement field (models/registry.py)
    "LowCNN": "fixed",
    "LowCNN_simple": "none",
    "LowCNN_gru": "gru",
    "LowCNN_gru2": "gru_feature",
}
_NETS = sorted(_REFINEMENT) + ["RAFT_Stereo"]


def load_torch_state_dict(path: str) -> dict:
    """``torch.load`` + container unwrap + ``module.`` strip."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return {k.removeprefix("module."): v for k, v in sd.items()}


def main(argv=None) -> str:
    p = argparse.ArgumentParser("stereoformer import-torch")
    p.add_argument("pth", help="reference .pth checkpoint")
    p.add_argument("out", help="output checkpoint directory")
    p.add_argument("--net", default="LowCNN_gru", choices=_NETS)
    opt = p.parse_args(argv)

    from ..train.torch_import import (convert_lowcnn_state_dict,
                                      convert_raft_state_dict)

    sd = load_torch_state_dict(opt.pth)
    if opt.net == "RAFT_Stereo":
        tree = convert_raft_state_dict(sd)
    else:
        tree = convert_lowcnn_state_dict(sd, refinement=_REFINEMENT[opt.net])

    import orbax.checkpoint as ocp

    out = os.path.abspath(opt.out)
    n_params = sum(int(np.size(x)) for x in _leaves(tree["params"]))
    cp = ocp.PyTreeCheckpointer()
    cp.save(out, {"step": np.int32(0), "params": tree["params"],
                  "batch_stats": tree["batch_stats"]})
    print(f"imported {n_params:,} params -> {out}", file=sys.stderr)
    return out


def _leaves(node):
    if isinstance(node, dict):
        for v in node.values():
            yield from _leaves(v)
    else:
        yield node


if __name__ == "__main__":
    main()
