"""Training CLI — flag-compatible with the reference ``train_low.py:82-113``
(plus TPU-specific flags), runnable as
``python -m stereoformer_tpu.cli.train``.

Round/epoch structure, checkpoint naming and best-EPE tracking mirror
``train_low.py:25-80``.
"""

from __future__ import annotations

import argparse
import datetime
import os
import random

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("stereoformer_tpu train")
    # reference flags (train_low.py:83-113)
    p.add_argument("--net", type=str, default="LowCNN_gru")
    p.add_argument("--loss", type=str, default=None,
                   help="loss-schedule JSON (config/loss_config_disp.json)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--devices", type=str, default="all",
                   help="'all' or comma list of device indices")
    p.add_argument("--dataset", type=str, default="SceneFlow")
    p.add_argument("--trainlist", type=str, default="")
    p.add_argument("--vallist", type=str, default="")
    p.add_argument("--datapath", type=str, default="")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--test_batch", type=int, default=4)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--use_deform", action="store_true")
    p.add_argument("--pretrain", type=str, default="none")
    p.add_argument("--outf", type=str, default="./saved_models")
    p.add_argument("--save_logdir", type=str, default="./logs")
    p.add_argument("--startRound", type=int, default=0)
    p.add_argument("--startEpoch", type=int, default=0)
    p.add_argument("--manualSeed", type=int, default=1024)
    # TPU-framework flags
    p.add_argument("--train_iters", type=int, default=12,
                   help="GRU iterations during training (the reference "
                        "accidentally used 1; see SURVEY §3.1)")
    p.add_argument("--eval_iters", type=int, default=12)
    p.add_argument("--loss_name", type=str, default=None,
                   choices=[None, "sequence", "equal", "single",
                            "range_supervised"])
    p.add_argument("--crop_h", type=int, default=320)
    p.add_argument("--crop_w", type=int, default=640)
    p.add_argument("--scale_h", type=int, default=576,
                   help="val/test image resize height "
                        "(SceneflowLoader.py:32 scale_size)")
    p.add_argument("--scale_w", type=int, default=960)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--filenames_dir", type=str, default=None,
                   help="directory of the KITTI/ETH3D/Middlebury list "
                        "registry (default: ./filenames)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer moments over the mesh "
                        "(ZeRO-style; parallel/fsdp.py) instead of "
                        "replicating them")
    p.add_argument("--dtype", type=str, default=None,
                   choices=[None, "f32", "bf16"],
                   help="compute dtype (params stay f32)")
    p.add_argument("--color_aug", action="store_true")
    p.add_argument("--no_mesh", action="store_true",
                   help="disable the device mesh (single-device debug)")
    p.add_argument("--epochs", type=int, default=None,
                   help="override epochs per round")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --outf "
                        "(utils/utils.py:103-113 resume_latest semantics, "
                        "wired in unlike the reference)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler device trace of epoch 0 here")
    p.add_argument("--gru_loop", type=str, default="unroll",
                   choices=["unroll", "scan"],
                   help="GRU iteration style for the LowCNN family: "
                        "unroll = fastest steps, longest cold compile; "
                        "scan = body traced once (cheap compiles, ~2x "
                        "slower steps) — numbers in BENCHMARKS.md")
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="with --gru_loop scan: lax.scan unroll window k. "
                        "Measured no-op on both train and eval speed "
                        "(BENCHMARKS.md 'GRU loop modes' — kept as a "
                        "tested negative result); ignored with "
                        "--gru_loop unroll")
    p.add_argument("--remat_update", action="store_true",
                   help="RAFT only: checkpoint each GRU-cascade iteration "
                        "(nn.remat) - the OOM escape hatch for larger "
                        "batches/crops at ~7% step cost (BENCHMARKS 'RAFT "
                        "remat_update A/B')")
    p.add_argument("--freeze_bn", action="store_true",
                   help="freeze BatchNorm during training (use running "
                        "stats, no stat updates) — the RAFT fine-tune "
                        "knob (raft_stereo.py:124-127 freeze_bn). "
                        "Fine-tuning only: from-scratch training with "
                        "frozen init statistics is unstable (diverges in "
                        "bf16), exactly as torch eval-mode BN would be")
    p.add_argument("--data_cache", default=None, metavar="DIR",
                   help="decoded-sample disk cache: epoch >=2 skips "
                        "PNG/PFM decode (bit-exact, invalidated by "
                        "source mtime; ~5 MB/sample — see data/cache.py)")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    if opt.scan_unroll != 1 and opt.gru_loop == "unroll":
        import warnings

        warnings.warn(
            "--scan_unroll only applies with --gru_loop scan; the fully "
            "unrolled loop ignores it.", stacklevel=1,
        )
    os.makedirs(opt.outf, exist_ok=True)
    os.makedirs(opt.save_logdir, exist_ok=True)

    # live diagnosis: `kill -USR1 <pid>` dumps all thread stacks to stderr
    # without stopping training
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)

    import jax

    from ..parallel import make_mesh
    from ..train import (
        DisparityTrainer,
        finalize_checkpoints,
        latest_checkpoint,
        save_checkpoint,
    )
    from ..utils import enable_persistent_cache, get_logger, load_loss_scheme

    enable_persistent_cache()
    logger = get_logger(os.path.join(opt.outf, "train.log"))

    random.seed(opt.manualSeed)
    np.random.seed(opt.manualSeed)

    if opt.loss:
        scheme = load_loss_scheme(opt.loss)
        train_round = scheme["round"]
        epochs = scheme["epoches"]
        loss_weights = scheme.get("loss_weights")
    else:
        train_round, epochs, loss_weights = 1, [opt.epochs or 70], None
    if opt.epochs is not None:
        epochs = [opt.epochs] * train_round

    if opt.resume:
        from ..train.checkpoint import checkpoint_meta

        latest = latest_checkpoint(opt.outf, opt.net)
        if latest:
            opt.pretrain = latest
            meta = checkpoint_meta(latest)
            opt.startRound = meta.get("round", opt.startRound)
            opt.startEpoch = meta.get("epoch", opt.startEpoch) + 1

    devices = jax.devices()
    if opt.devices not in ("all", ""):
        idx = [int(d) for d in opt.devices.split(",")]
        devices = [devices[i] for i in idx]
    # a 1-device mesh buys nothing and sharding annotations are not
    # supported by every PJRT transport — only mesh up when actually DP
    mesh = None if (opt.no_mesh or len(devices) < 2) else make_mesh(devices)
    logger.info("mesh: %s (%d devices)", mesh, len(devices))

    trainer = DisparityTrainer(
        lr=opt.lr,
        dataset=opt.dataset,
        trainlist=opt.trainlist,
        vallist=opt.vallist,
        datapath=opt.datapath,
        batch_size=opt.batch_size,
        maxdisp=opt.maxdisp,
        pretrain=opt.pretrain,
        model=opt.net,
        test_batch=opt.test_batch,
        loss=opt.loss_name,
        loss_weights=(loss_weights[opt.startRound]
                      if loss_weights else None),  # per-round updates below
        train_iters=opt.train_iters,
        eval_iters=opt.eval_iters,
        crop_size=(opt.crop_h, opt.crop_w),
        num_workers=opt.workers,
        seed=opt.manualSeed,
        mesh=mesh,
        remat=opt.remat,
        fsdp=opt.fsdp and mesh is not None,
        color_aug=opt.color_aug,
        dtype=opt.dtype,
        scale_size=(opt.scale_h, opt.scale_w),
        filenames_dir=opt.filenames_dir,
        gru_loop=opt.gru_loop,
        scan_unroll=opt.scan_unroll,
        freeze_bn=opt.freeze_bn,
        remat_update=opt.remat_update,
        data_cache=opt.data_cache,
    )
    trainer.initialize()

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(opt.save_logdir)
    except Exception:
        logger.info("tensorboard unavailable; scalar logging to stdout only")

    best_epe, best_index = -1.0, 0
    if trainer.is_pretrain:
        best_epe = trainer.validate(writer, epoch=opt.startEpoch)

    iterations = 0
    start_epoch = opt.startEpoch
    for r in range(opt.startRound, train_round):
        end_epoch = epochs[r] if r < len(epochs) else epochs[-1]
        logger.info("round %d (%d epochs)%s", r, end_epoch,
                    f" weights {loss_weights[r]}" if loss_weights else "")
        if loss_weights and r < len(loss_weights):
            trainer.set_loss_weights(loss_weights[r])
        for i in range(start_epoch, end_epoch):
            if opt.profile_dir and i == start_epoch and r == opt.startRound:
                with jax.profiler.trace(opt.profile_dir):
                    avg_loss, avg_epe, iterations = trainer.train_one_epoch(
                        i, r, iterations, writer
                    )
            else:
                avg_loss, avg_epe, iterations = trainer.train_one_epoch(
                    i, r, iterations, writer
                )
            val_epe = trainer.validate(writer, i)
            is_best = best_epe < 0 or val_epe < best_epe
            if is_best:
                best_epe, best_index = val_epe, i
            save_checkpoint(
                opt.outf, trainer.get_model(), opt.net, r, i, val_epe, is_best
            )
            logger.info(
                "Validation[epoch:%d]: %s loss %.4f trainEPE %.4f valEPE %.4f lr %.2e",
                i, datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
                avg_loss, avg_epe, val_epe, trainer.current_lr,
            )
            logger.info("min epe from epoch %d", best_index)
        start_epoch = 0
    finalize_checkpoints()


if __name__ == "__main__":
    main()
