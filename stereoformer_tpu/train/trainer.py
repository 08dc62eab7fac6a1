"""DisparityTrainer — the training orchestration layer.

API-parity with the reference trainers (train_file/trainer_DLC_GRU.py:28-297,
trainer_LC.py, train_DLC.py — all three collapse into one class here, the
variant being a (model, loss) pair): ``DisparityTrainer(lr, dataset,
trainlist, vallist, datapath, batch_size, maxdisp, pretrain, model,
test_batch).initialize()`` then ``train_one_epoch`` / ``validate``.

TPU-native differences:
- one jitted train step (forward+loss+grad+Adam+BN updates in one XLA
  program) instead of eager per-op dispatch;
- SPMD data parallelism over a device mesh instead of DataParallel;
- optax amsgrad-Adam with the reference's exact per-epoch LR schedule
  compiled in as a step schedule;
- deterministic, PRNG-explicit augmentation; per-epoch loader reseeding.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import parallel
from ..data import (
    DataLoader,
    DummyStereoDataset,
    StereoDataset,
    train_transform,
    val_transform,
)
from ..models import get_model
from ..utils import AverageMeter, get_logger
from .checkpoint import restore_checkpoint, restore_params
from .schedule import make_step_schedule
from .state import TrainState
from .steps import make_eval_step, make_train_step

logger = get_logger()

# default loss per model family (which reference trainer used it)
_DEFAULT_LOSS = {
    "LowCNN_gru": "sequence",            # trainer_DLC_GRU.py:21
    "LowCNN_gru2": "sequence",
    "LowCNN_dynamic_supervised": "range_supervised",  # train_DLC.py:24
    "LowCNN_dynamic": "equal",
    "LowCNN_ada": "equal",               # trainer_LC.py (multiequalloss)
    "LowCNN": "single",
    "LowCNN_simple": "single",
}


class DisparityTrainer:
    def __init__(
        self,
        lr: float,
        dataset: str = "SceneFlow",
        trainlist: str = "",
        vallist: str = "",
        datapath: str = "",
        batch_size: int = 4,
        maxdisp: int = 192,
        pretrain: Optional[str] = None,
        model: str = "LowCNN_gru",
        test_batch: int = 4,
        loss: Optional[str] = None,
        loss_weights=None,
        train_iters: int = 12,
        eval_iters: int = 12,
        crop_size: tuple[int, int] = (320, 640),
        num_workers: Optional[int] = None,
        seed: int = 1024,
        mesh=None,
        remat: bool = False,
        fsdp: bool = False,
        color_aug: bool = False,
        dtype: Optional[str] = None,
        scale_size: Optional[tuple[int, int]] = None,
        filenames_dir: Optional[str] = None,
        gru_loop: str = "unroll",
        remat_update: bool = False,
        scan_unroll: int = 1,
        freeze_bn: bool = False,
        data_cache: Optional[str] = None,
    ):
        self.lr = lr
        self.dataset = dataset
        self.trainlist, self.vallist = trainlist, vallist
        self.datapath = datapath
        self.batch_size, self.test_batch = batch_size, test_batch
        self.maxdisp = maxdisp
        self.pretrain = pretrain
        self.model_name = model
        self.loss_name = loss or _DEFAULT_LOSS.get(model, "sequence")
        self.loss_weights = tuple(loss_weights) if loss_weights else (0.8, 1.2)
        self.train_iters, self.eval_iters = train_iters, eval_iters
        self.crop_size = crop_size
        self.num_workers = num_workers
        self.seed = seed
        self.mesh = mesh
        self.remat = remat
        self.fsdp = fsdp
        self.state_shardings = None
        self.filenames_dir = filenames_dir
        self.color_aug = color_aug
        self.dtype = dtype
        self.gru_loop = gru_loop
        self.remat_update = remat_update
        self.scan_unroll = scan_unroll
        self.freeze_bn = freeze_bn
        self.data_cache = data_cache
        self.scale_size = scale_size
        self.current_lr = lr
        self.is_pretrain = False

    # -- setup ---------------------------------------------------------------

    def _prepare_dataset(self):
        if self.dataset.startswith("dummy"):
            # "dummy" or "dummy:N" (N synthetic training pairs)
            n = (
                int(self.dataset.split(":", 1)[1])
                if ":" in self.dataset
                else max(self.batch_size * 4, 8)
            )
            self.train_set = DummyStereoDataset(
                length=n,
                height=self.crop_size[0], width=self.crop_size[1],
                mode="train",
            )
            self.val_set = DummyStereoDataset(
                length=max(self.test_batch * 2, 4),
                height=self.crop_size[0], width=self.crop_size[1],
                mode="val", seed=1,
            )
        else:
            kw = {"scale_size": self.scale_size} if self.scale_size else {}
            if self.data_cache:
                kw["cache_dir"] = self.data_cache
            if self.filenames_dir:
                # KITTI/ETH3D/Middlebury list files live in a filenames/
                # registry (SceneflowLoader.py:41-60); overridable so
                # training is not tied to the repo root as the cwd
                kw["filenames_dir"] = self.filenames_dir
            self.train_set = StereoDataset(
                self.datapath, self.trainlist, self.vallist,
                dataset_name=self.dataset, mode="train", **kw,
            )
            self.val_set = StereoDataset(
                self.datapath, self.trainlist, self.vallist,
                dataset_name=self.dataset, mode="val", **kw,
            )
        crop = self.crop_size
        color = self.color_aug
        self.train_loader = DataLoader(
            self.train_set, self.batch_size, shuffle=True,
            num_workers=self.num_workers, seed=self.seed,
            transform_with_rng=lambda s, rng: train_transform(
                s, rng, crop=crop, color=color
            ),
        )
        self.val_loader = DataLoader(
            self.val_set, self.test_batch, shuffle=False,
            num_workers=self.num_workers, drop_last=False, seed=self.seed,
            transform_with_rng=lambda s, rng: val_transform(s),
        )
        self.steps_per_epoch = max(len(self.train_loader), 1)

    def _build_net(self):
        kw = {}
        if self.dtype in ("bf16", "bfloat16"):
            kw["dtype"] = jnp.bfloat16
        if self.gru_loop != "unroll":
            # loop="scan" trades ~2x slower steps for much cheaper cold
            # compiles; scan_unroll is a measured no-op kept as a knob
            # (BENCHMARKS.md "GRU loop modes")
            kw["loop"] = self.gru_loop
            kw["scan_unroll"] = self.scan_unroll
        if self.remat_update:
            # RAFT-only memory knob: checkpoint each GRU-cascade
            # iteration (+~7% step time, -2.6 GiB peak at B=4 @ 320x720
            # - BENCHMARKS "RAFT remat_update A/B"); other families'
            # iteration memory is managed by --remat / --gru_loop scan
            assert self.model_name.startswith("RAFT"), (
                "--remat_update applies to the RAFT family only"
            )
            kw["remat_update"] = True
        self.net = get_model(self.model_name, max_disp=self.maxdisp, **kw)
        h, w = self.crop_size
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        # jit the init: eager init dispatches op-by-op (minutes through a
        # remote-TPU tunnel); compiled it is seconds.
        variables = jax.jit(
            lambda key, l, r: self.net.init(key, l, r, iters=1, train=False)
        )(jax.random.PRNGKey(self.seed), dummy, dummy)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        n = sum(p.size for p in jax.tree_util.tree_leaves(self.params))
        logger.info("Number of model parameters: %d", n)

    def _build_optimizer(self):
        schedule = make_step_schedule(self.lr, self.steps_per_epoch)
        self.tx = optax.amsgrad(schedule, b1=0.9, b2=0.999)
        # jitted: eager optimizer init is hundreds of tiny dispatches
        self.state = jax.jit(
            lambda p, bs: TrainState(
                step=jnp.asarray(0, jnp.int32),
                params=p,
                batch_stats=bs,
                opt_state=self.tx.init(p),
            )
        )(self.params, self.batch_stats)
        if self.mesh is not None:
            if self.fsdp:
                # ZeRO-style: params + amsgrad moments sharded over the
                # data axis; the train step pins its output to the same
                # shardings (parallel/fsdp.py)
                self.state, self.state_shardings = parallel.shard_state_fsdp(
                    self.state, self.mesh
                )
            else:
                self.state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, parallel.replicated(self.mesh)),
                    self.state,
                )

    def initialize(self):
        if self.mesh is not None:
            n = self.mesh.devices.size
            # padding train batches would feed fake samples into the loss
            # (and BN stats); require clean divisibility instead
            assert self.batch_size % n == 0 and self.test_batch % n == 0, (
                f"batch_size={self.batch_size} / test_batch={self.test_batch}"
                f" must be divisible by the {n}-device mesh"
            )
        self._prepare_dataset()
        self._build_net()
        self._build_optimizer()
        self.train_step = make_train_step(
            self.net, self.tx, self.loss_name, iters=self.train_iters,
            weights=self.loss_weights, remat=self.remat,
            state_out_shardings=self.state_shardings,
            freeze_bn=self.freeze_bn,
        )
        self.eval_step = make_eval_step(self.net, iters=self.eval_iters)
        if self.pretrain and self.pretrain != "none":
            try:
                # sharding-aware: with FSDP shardings orbax restores each
                # leaf straight into its NamedSharding (no replicated
                # restore spike, no re-pin pass)
                self.state = restore_checkpoint(
                    self.pretrain, self.state,
                    shardings=self.state_shardings,
                )
                self.is_pretrain = True
                logger.info("Loaded pretrain checkpoint: %s", self.pretrain)
            except Exception as e:
                # params-only fallback: checkpoints without optimizer
                # state (a converted reference .pth — cli/import_torch —
                # or a save from a different optimizer config) restore
                # params + batch_stats and start the moments fresh,
                # mirroring the reference's state_dict-only loading
                # (utils/utils.py:73-100)
                try:
                    self.state = restore_params(self.pretrain, self.state)
                    self.is_pretrain = True
                    logger.info(
                        "Loaded pretrain params (optimizer state fresh): %s",
                        self.pretrain)
                except Exception:
                    logger.warning(
                        "Cannot load %s (%s); starting fresh",
                        self.pretrain, e)

    def set_loss_weights(self, weights):
        """Swap the per-round loss weights (loss-schedule JSON rounds,
        train_low.py:51-58): rebuilds the jitted train step when they
        actually change."""
        w = tuple(weights)
        if w == self.loss_weights:
            return
        self.loss_weights = w
        self.train_step = make_train_step(
            self.net, self.tx, self.loss_name, iters=self.train_iters,
            weights=self.loss_weights, remat=self.remat,
            state_out_shardings=self.state_shardings,
            freeze_bn=self.freeze_bn,
        )

    # -- epoch loops ---------------------------------------------------------

    def adjust_learning_rate(self, epoch: int) -> float:
        """The LR is compiled into the step schedule; this mirrors the
        reference API and reports the current value
        (trainer_DLC_GRU.py:136-146)."""
        from .schedule import reference_lr

        self.current_lr = float(reference_lr(self.lr, epoch))
        return self.current_lr

    def _prefetched(self, loader, depth: int = 2):
        """Run host decode + H2D transfer ``depth`` batches ahead of the
        consumer (device_put is async, so the copy of batch N+1 overlaps
        step N — the reference relied on DataLoader worker prefetch only)."""
        from collections import deque

        buf = deque()
        for batch in loader:
            buf.append(self._device_batch(batch))
            if len(buf) > depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def _device_batch(self, batch: dict) -> dict:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if self.mesh is not None:
            n = self.mesh.devices.size
            bs = arrays["img_left"].shape[0]
            if bs % n:
                arrays = parallel.pad_batch_to(arrays, ((bs + n - 1) // n) * n)
            return parallel.shard_batch(arrays, self.mesh)
        return {k: jnp.asarray(v) for k, v in arrays.items()}

    def train_one_epoch(self, epoch: int, round_idx: int, iterations: int,
                        summary_writer=None, log_every: int = 10):
        """One epoch.  Metrics stay on-device and are synced only at log
        points and once at epoch end (a host sync through a remote-TPU
        transport costs ~32 ms — syncing every step would rival the step
        itself; the reference's eager trainer pays this implicitly,
        trainer_DLC_GRU.py:163-228)."""
        self.adjust_learning_rate(epoch)
        self.train_loader.set_epoch(epoch)
        batch_time, data_time = AverageMeter(), AverageMeter()
        device_metrics: list = []       # [(loss, epe) device scalars]
        start_iter = iterations
        end = time.perf_counter()
        for i_batch, batch in enumerate(self._prefetched(self.train_loader)):
            data_time.update(time.perf_counter() - end)
            self.state, metrics = self.train_step(self.state, batch)
            device_metrics.append((metrics["loss"], metrics["epe"]))
            batch_time.update(time.perf_counter() - end)
            end = time.perf_counter()
            iterations += 1
            if i_batch % log_every == 0:
                loss, epe = (float(x) for x in device_metrics[-1])
                logger.info(
                    "Epoch [%d][%d/%d] time %.3f (%.3f) data %.3f loss %.3f EPE %.3f",
                    epoch, i_batch, len(self.train_loader),
                    batch_time.val, batch_time.avg, data_time.avg, loss, epe,
                )
                end = time.perf_counter()  # don't bill the sync to data time
        if not device_metrics:
            return 0.0, 0.0, iterations
        # one bulk transfer for the whole epoch
        stacked = np.asarray(jnp.stack([jnp.stack(m) for m in device_metrics]))
        losses_np, epes_np = stacked[:, 0], stacked[:, 1]
        if summary_writer is not None:
            for i, (l, e) in enumerate(zip(losses_np, epes_np)):
                summary_writer.add_scalar("total_loss", float(l), start_iter + i)
                summary_writer.add_scalar("epe", float(e), start_iter + i)
            summary_writer.add_scalar("Learning_Rate", self.current_lr, epoch)
        return float(losses_np.mean()), float(epes_np.mean()), iterations

    def validate(self, summary_writer=None, epoch: int = 0):
        epes_m, p1_m, inf_t = AverageMeter(), AverageMeter(), AverageMeter()
        logged_images = False
        for batch in self.val_loader:
            n = batch["img_left"].shape[0]          # true sample count
            if n < self.test_batch:
                # fixed shapes: a differently-sized final batch would cost
                # a second cold compile; padded rows have gt=0 and all
                # eval metrics are gt-masked, so they contribute nothing
                batch = parallel.pad_batch_to(
                    {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray)},
                    self.test_batch,
                )
            dev_batch = self._device_batch(batch)
            t0 = time.perf_counter()
            metrics = self.eval_step(self.state, dev_batch)
            # float() is the only call that truly round-trips on the axon
            # transport (block_until_ready returns at dispatch there), so
            # the timed region ends at a scalar host sync.  The measured
            # time includes one fixed ~32 ms transport round trip.
            epe = float(metrics["epe"])
            dt = time.perf_counter() - t0
            p1 = float(metrics["p1"])
            if np.isfinite(epe):
                epes_m.update(epe, n)
            if np.isfinite(p1):
                p1_m.update(p1, n)
            inf_t.update(dt / n, n)
            if summary_writer is not None and not logged_images:
                # input / prediction / GT / KITTI-error panel for the first
                # val sample (reference utils/devtools.py:59-74 image grids)
                from ..utils.viz import tensorboard_disparity_images

                tensorboard_disparity_images(
                    summary_writer, "val",
                    np.asarray(batch["img_left"][0]),
                    np.asarray(metrics["pred"][0, ..., 0]),
                    np.asarray(batch["gt_disp"][0, ..., 0]),
                    epoch,
                )
                logged_images = True
        if summary_writer is not None:
            summary_writer.add_scalar("epe_on_val", epes_m.avg, epoch)
        logger.info(
            "Validate epoch %d: EPE %.4f P1 %.4f inference %.4fs/img",
            epoch, epes_m.avg, p1_m.avg, inf_t.avg,
        )
        return epes_m.avg

    def get_model(self):
        return self.state
