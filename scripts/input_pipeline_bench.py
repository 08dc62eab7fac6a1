"""Input-pipeline throughput: decode+transform pairs/s of the host data
path, measured on disk at the reference's data geometry.

SURVEY §7.3 names "PFM decode + crops fast enough to feed a pod slice" a
hard part; the reference feeds one GPU from 4 DataLoader worker
processes (`train_file/trainer_DLC_GRU.py:79-82`).  This script measures
our equivalent — StereoDataset (PIL PNG decode + PFM decode) →
train_transform (RandomCrop 320×640 + ÷255 + Normalize) → threaded
DataLoader collate — in pairs/s at ``datathread`` ∈ {4, 8}, with the
native decoder (native/libstereoformer_io.so) on and off, and reports
how many chips' worth of the measured 139 pairs/s single-chip training
consumption (BENCHMARKS.md, B=8 @ 320×640) one host can feed.

Fixtures: SceneFlow-format tree (8-bit PNG pairs + PFM disparity) at the
native SceneFlow resolution 540×960 (SceneflowLoader.py:31), list file
repeating N distinct pairs to EPOCH samples.  CPU-only; does not touch
the TPU.

usage: python scripts/input_pipeline_bench.py [fixture_dir]
  (fixture_dir defaults to a temp dir; pass a persistent one to reuse
  fixtures across runs)
env: PIPE_EPOCH (samples per timed epoch, default 512), PIPE_DISTINCT
  (distinct pairs on disk, default 16), PIPE_BATCH (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 540, 960  # SceneFlow native resolution (SceneflowLoader.py:31)
EPOCH = int(os.environ.get("PIPE_EPOCH", "512"))
DISTINCT = int(os.environ.get("PIPE_DISTINCT", "16"))
BATCH = int(os.environ.get("PIPE_BATCH", "8"))
TRAIN_CONSUMPTION = 139.0  # pairs/s, 1-chip B=8 @ 320x640 (BENCHMARKS.md)


def build_fixtures(root: str) -> str:
    """SceneFlow-format tree + a list file of EPOCH lines cycling
    DISTINCT distinct pairs; returns the list path."""
    from PIL import Image

    from stereoformer_tpu import data

    listpath = os.path.join(root, f"train_{DISTINCT}_{EPOCH}.list")
    marker = os.path.join(root, f".fixtures_{DISTINCT}_{H}x{W}")
    rels = []
    for i in range(DISTINCT):
        rel_l = f"frames_finalpass/TRAIN/A/{i:04d}/left/0006.png"
        rel_r = f"frames_finalpass/TRAIN/A/{i:04d}/right/0006.png"
        rel_d = f"disparity/TRAIN/A/{i:04d}/left/0006.pfm"
        rels.append((rel_l, rel_r, rel_d))
    if not os.path.exists(marker):
        ds = data.DummyStereoDataset(length=DISTINCT, height=H, width=W,
                                     max_disp=96.0)
        for i, (rel_l, rel_r, rel_d) in enumerate(rels):
            s = ds[i]
            for rel in (rel_l, rel_r, rel_d):
                os.makedirs(os.path.join(root, os.path.dirname(rel)),
                            exist_ok=True)
            Image.fromarray(s["img_left"].astype(np.uint8)).save(
                os.path.join(root, rel_l))
            Image.fromarray(s["img_right"].astype(np.uint8)).save(
                os.path.join(root, rel_r))
            data.write_pfm(os.path.join(root, rel_d), s["gt_disp"])
        with open(marker, "w") as f:
            f.write("ok\n")
    with open(listpath, "w") as f:
        for j in range(EPOCH):
            rel_l, rel_r, rel_d = rels[j % DISTINCT]
            f.write(f"{rel_l} {rel_r} {rel_d}\n")
    return listpath


def measure(root: str, listpath: str, workers: int,
            cache_dir: str | None = None) -> dict:
    from stereoformer_tpu import data
    from stereoformer_tpu.data.transforms import train_transform

    ds = data.StereoDataset(root, listpath, listpath,
                            dataset_name="SceneFlow", mode="train",
                            cache_dir=cache_dir)
    loader = data.DataLoader(
        ds, batch_size=BATCH, shuffle=True, num_workers=workers,
        drop_last=True, seed=0, prefetch=4,
        transform_with_rng=lambda s, rng: train_transform(s, rng),
    )
    # one warm epoch batch to fill page cache + thread pool spin-up is
    # excluded by timing from the first yielded batch
    it = iter(loader)
    first = next(it)
    assert first["img_left"].shape == (BATCH, 320, 640, 3), first[
        "img_left"].shape
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["img_left"].shape[0]
    dt = time.perf_counter() - t0
    return {"workers": workers, "pairs_per_sec": n / dt, "pairs": n,
            "seconds": dt}


def main() -> None:
    from stereoformer_tpu.data import native

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="sf_pipe_")
    os.makedirs(root, exist_ok=True)
    t0 = time.perf_counter()
    listpath = build_fixtures(root)
    print(f"fixtures at {root} ({time.perf_counter()-t0:.1f}s), "
          f"{DISTINCT} distinct pairs @ {H}x{W}, epoch={EPOCH}",
          file=sys.stderr)

    rows = []
    for native_on in (True, False):
        if native_on and not native.available():
            print("native lib not built (make -C native): skipping native "
                  "rows", file=sys.stderr)
            continue
        if not native_on:
            # force the pure-python fallback (PIL/numpy PFM)
            native._lib = None
            saved, native._LIB_PATH = native._LIB_PATH, "/nonexistent"
        try:
            for workers in (4, 8):
                r = measure(root, listpath, workers)
                r["native"] = native_on and native.available()
                r["chips_fed_at_139_pairs_s"] = round(
                    r["pairs_per_sec"] / TRAIN_CONSUMPTION, 2)
                rows.append(r)
                print(f"native={r['native']} workers={workers}: "
                      f"{r['pairs_per_sec']:.1f} pairs/s "
                      f"({r['chips_fed_at_139_pairs_s']}x one-chip "
                      f"consumption)", file=sys.stderr)
        finally:
            if not native_on:
                native._LIB_PATH = saved

    # decoded-sample cache (--data_cache): epoch 1 populates (measured as
    # the 'cold' row), epoch ≥2 skips PNG/PFM decode entirely
    cache_dir = os.path.join(root, "decoded_cache")
    for label, workers in (("cache_cold", 4), ("cache_warm", 4),
                           ("cache_warm", 8)):
        r = measure(root, listpath, workers, cache_dir=cache_dir)
        r["native"] = native.available()
        r["cache"] = label
        r["chips_fed_at_139_pairs_s"] = round(
            r["pairs_per_sec"] / TRAIN_CONSUMPTION, 2)
        rows.append(r)
        print(f"{label} workers={workers}: {r['pairs_per_sec']:.1f} pairs/s "
              f"({r['chips_fed_at_139_pairs_s']}x one-chip consumption)",
              file=sys.stderr)
    print(json.dumps({"resolution": f"{H}x{W}", "crop": "320x640",
                      "batch": BATCH, "rows": rows}))


if __name__ == "__main__":
    main()
