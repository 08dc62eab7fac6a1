"""Host-side input pipeline: threaded decode workers + batching +
device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` with 4 worker
*processes* (trainer_DLC_GRU.py:79-82, ``datathread`` env var).  Decoding
(PFM/PNG) releases the GIL inside numpy/PIL, so a thread pool saturates
the pipe without pickling overhead; batches are stacked into pinned host
arrays and (optionally) transferred ahead of compute with
``jax.device_put`` under the global sharding so each device receives only
its batch shard (multi-host: each process feeds its addressable shard).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

BATCH_KEYS = ("img_left", "img_right", "gt_disp", "pseudo_disp")


def num_workers_default() -> int:
    """Reference reads the ``datathread`` env var, default 4
    (trainer_DLC_GRU.py:79-82)."""
    return int(os.environ.get("datathread", "4"))


def _collate(samples: list[dict]) -> dict:
    batch = {}
    for k in BATCH_KEYS:
        if k in samples[0]:
            arrs = [s[k] for s in samples]
            batch[k] = np.stack(arrs).astype(np.float32)
    for k in ("gt_disp", "pseudo_disp"):
        if k in batch and batch[k].ndim == 3:
            batch[k] = batch[k][..., None]  # NHW -> NHW1
    if "left_name" in samples[0]:
        batch["left_name"] = [s["left_name"] for s in samples]
    return batch


class DataLoader:
    """Iterable over batched sample dicts with background decode threads.

    Deterministic: the shuffle order derives from ``seed`` + epoch, and
    each sample's augmentation RNG derives from (seed, epoch, index) —
    workers can run in any order without changing the data.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: Optional[int] = None,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        transform_with_rng=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = (
            num_workers_default() if num_workers is None else num_workers
        )
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.transform_with_rng = transform_with_rng
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + 977 * self.epoch).shuffle(idx)
        return idx

    def _load_one(self, index: int) -> dict:
        sample = self.dataset[int(index)]
        if self.transform_with_rng is not None:
            rng = np.random.default_rng(
                (self.seed, self.epoch, int(index))
            )
            sample = self.transform_with_rng(sample, rng)
        return sample

    def __iter__(self) -> Iterator[dict]:
        order = self._index_order()
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if self.num_workers <= 0:
            for b in batches:
                yield _collate([self._load_one(i) for i in b])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from collections import deque
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    # keep only `prefetch`+1 batches of decode futures in
                    # flight — submitting the whole epoch up front would
                    # buffer unbounded decoded samples in memory
                    in_flight: deque = deque()
                    it = iter(batches)
                    while True:
                        while len(in_flight) <= self.prefetch:
                            b = next(it, None)
                            if b is None:
                                break
                            in_flight.append(
                                [pool.submit(self._load_one, i) for i in b]
                            )
                        if not in_flight:
                            break
                        fb = in_flight.popleft()
                        if stop.is_set():
                            for flist in in_flight:
                                for f in flist:
                                    f.cancel()
                            return
                        out_q.put(_collate([f.result() for f in fb]))
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator, sharding=None, size: int = 2):
    """Move batches to device ahead of compute.  With a ``NamedSharding``
    each device gets its row shard (SPMD data parallelism); without, a
    plain ``device_put``."""
    import collections

    import jax

    buf = collections.deque()

    def _put(batch):
        arrays = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        if sharding is not None:
            arrays = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        else:
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        return {**arrays, **rest}

    it = iter(iterator)
    for batch in it:
        buf.append(_put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
