"""Standalone evaluation CLI: run a checkpoint over a validation split and
report EPE / P1 / D1 and per-image inference time (the reference folds
this into the trainer's ``validate``, trainer_DLC_GRU.py:233-294; a
separate tool makes benchmark reproduction one command).

Usage:
  python -m stereoformer_tpu.cli.evaluate --ckpt saved/model_best \
      --dataset SceneFlow --vallist filenames/SceneFlow_finalpass_val.txt \
      --datapath /data/sceneflow [--net LowCNN_gru] [--iters 12]
  # or synthetic: --dataset dummy
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser("stereoformer_tpu evaluate")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--net", type=str, default="LowCNN_gru")
    p.add_argument("--dataset", type=str, default="SceneFlow")
    p.add_argument("--trainlist", type=str, default="")
    p.add_argument("--vallist", type=str, default="")
    p.add_argument("--datapath", type=str, default="")
    p.add_argument("--test_batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--crop_h", type=int, default=320)
    p.add_argument("--crop_w", type=int, default=640)
    p.add_argument("--workers", type=int, default=None)
    opt = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from .. import losses, metrics
    from ..data import (
        DataLoader, DummyStereoDataset, StereoDataset, val_transform,
    )
    from ..models import get_model
    from ..ops import scale_disp
    from ..train import TrainState, restore_params
    from ..utils import AverageMeter, get_logger

    logger = get_logger()

    if opt.dataset == "dummy":
        val_set = DummyStereoDataset(
            length=8, height=opt.crop_h, width=opt.crop_w, mode="val", seed=1
        )
    else:
        val_set = StereoDataset(
            opt.datapath, opt.trainlist, opt.vallist,
            dataset_name=opt.dataset, mode="val",
        )
    loader = DataLoader(
        val_set, opt.test_batch, shuffle=False, drop_last=False,
        num_workers=opt.workers,
        transform_with_rng=lambda s, rng: val_transform(s),
    )

    model = get_model(opt.net, max_disp=opt.maxdisp)
    dummy = jnp.zeros((1, opt.crop_h, opt.crop_w, 3), jnp.float32)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1, train=False)
    )(dummy, dummy)
    tx = optax.amsgrad(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    if opt.ckpt:
        state = restore_params(opt.ckpt, state)
        logger.info("restored %s", opt.ckpt)

    @jax.jit
    def eval_step(state, left, right, gt):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            left, right, iters=opt.iters, train=False,
        )
        pred = out["disparities"][-1]
        if pred.shape[1:3] != gt.shape[1:3]:
            pred = scale_disp(pred, (gt.shape[1], gt.shape[2]))
        return {
            "epe": losses.epe(pred, gt),
            "p1": metrics.p1_metric(pred, gt),
            "d1": metrics.d1_metric(pred, gt),
        }

    epe_m, p1_m, d1_m, t_m = (AverageMeter() for _ in range(4))
    for batch in loader:
        left = jnp.asarray(batch["img_left"])
        right = jnp.asarray(batch["img_right"])
        gt = jnp.asarray(batch["gt_disp"])
        t0 = time.perf_counter()
        m = eval_step(state, left, right, gt)
        m = {k: float(v) for k, v in m.items()}
        dt = (time.perf_counter() - t0) / left.shape[0]
        n = left.shape[0]
        if np.isfinite(m["epe"]):
            epe_m.update(m["epe"], n)
            p1_m.update(m["p1"], n)
            d1_m.update(m["d1"], n)
        t_m.update(dt, n)
    result = {
        "net": opt.net, "dataset": opt.dataset, "iters": opt.iters,
        "EPE": round(epe_m.avg, 4), "P1": round(p1_m.avg, 4),
        "D1": round(d1_m.avg, 4), "s_per_image": round(t_m.avg, 4),
        "images": epe_m.count,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
