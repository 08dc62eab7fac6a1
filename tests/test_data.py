"""Data layer: PFM round-trip, transforms, list-file dataset, loader."""

import os

import numpy as np
import pytest

from stereoformer_tpu import data


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    disp = rng.rand(37, 53).astype(np.float32) * 100
    p = str(tmp_path / "d.pfm")
    data.write_pfm(p, disp)
    back, scale = data.read_pfm(p)
    np.testing.assert_allclose(back, disp, atol=1e-6)
    # read_disp wrapper
    np.testing.assert_allclose(data.read_disp(p), disp, atol=1e-6)


def test_kitti_png_roundtrip(tmp_path):
    from PIL import Image

    disp = (np.random.RandomState(0).rand(10, 12) * 100 * 256).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(disp).save(p)
    back = data.read_disp(p)
    np.testing.assert_allclose(back, disp.astype(np.float32) / 256.0, atol=1e-6)


def test_random_crop_and_pad():
    rng = np.random.default_rng(0)
    s = {
        "img_left": np.ones((100, 200, 3), np.float32),
        "img_right": np.ones((100, 200, 3), np.float32),
        "gt_disp": np.ones((100, 200), np.float32),
    }
    out = data.random_crop(dict(s), 64, 128, rng)
    assert out["img_left"].shape == (64, 128, 3)
    assert out["gt_disp"].shape == (64, 128)
    # pad path: top-pad + right-pad with zeros (reference semantics)
    out2 = data.random_crop(dict(s), 128, 256, rng)
    assert out2["img_left"].shape == (128, 256, 3)
    assert (out2["img_left"][:28] == 0).all()       # top pad
    assert (out2["img_left"][:, 200:] == 0).all()   # right pad
    assert (out2["img_left"][28:, :200] == 1).all()


def test_normalize_matches_reference_constants():
    s = {
        "img_left": np.full((4, 4, 3), 127.5, np.float32),
        "img_right": np.full((4, 4, 3), 127.5, np.float32),
    }
    out = data.normalize(data.to_unit(dict(s)))
    want = (0.5 - data.IMAGENET_MEAN) / data.IMAGENET_STD
    np.testing.assert_allclose(out["img_left"][0, 0], want, rtol=1e-5)


def test_random_color_preserves_shape_and_range():
    rng = np.random.default_rng(3)
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32) * 255
    s = {"img_left": img.copy(), "img_right": img.copy()}
    out = data.random_color(s, rng)
    assert out["img_left"].shape == (16, 16, 3)
    assert out["img_left"].min() >= 0 and out["img_left"].max() <= 255


def test_dummy_dataset_consistency():
    ds = data.DummyStereoDataset(length=2, height=64, width=128, max_disp=16)
    s = ds[0]
    assert s["img_left"].shape == (64, 128, 3)
    assert s["gt_disp"].shape == (64, 128)
    assert s["gt_disp"].min() >= 4.0 and s["gt_disp"].max() <= 16.0
    # determinism
    s2 = ds[0]
    np.testing.assert_array_equal(s["img_left"], s2["img_left"])
    # warp consistency: right(x) ≈ left(x+d) where in-bounds
    d = s["gt_disp"]
    x = np.arange(128)[None, :] + d
    ok = x < 127
    # sampled check at integer-ish positions
    err = []
    for y in range(0, 64, 7):
        for xx in range(0, 100, 11):
            if ok[y, xx]:
                src = x[y, xx]
                x0 = int(np.floor(src))
                t = src - x0
                want = s["img_left"][y, x0, 0] * (1 - t) + s["img_left"][y, x0 + 1, 0] * t
                err.append(abs(s["img_right"][y, xx, 0] - want))
    assert np.mean(err) < 1e-3


def test_dummy_dataset_cache_bit_identical_and_isolated():
    """The cross-epoch sample cache must (a) return bit-identical values
    to a cache-cold dataset and (b) hand out private copies so in-place
    transform mutation cannot corrupt later epochs."""
    a = data.DummyStereoDataset(length=2, height=32, width=64, max_disp=8)
    b = data.DummyStereoDataset(length=2, height=32, width=64, max_disp=8)
    warm = a[1]       # populates a's cache
    warm2 = a[1]      # cache hit
    cold = b[1]       # fresh generation
    for k in ("img_left", "img_right", "gt_disp"):
        np.testing.assert_array_equal(warm[k], cold[k])
        np.testing.assert_array_equal(warm2[k], cold[k])
    # mutate the returned arrays; the cache must be unaffected
    warm["img_left"][:] = -1.0
    again = a[1]
    np.testing.assert_array_equal(again["img_left"], cold["img_left"])


def test_list_file_dataset(tmp_path):
    # build a tiny on-disk dataset in the reference list-file format
    from PIL import Image

    ddir = tmp_path / "dataroot"
    (ddir / "L").mkdir(parents=True)
    (ddir / "R").mkdir()
    (ddir / "D").mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(3):
        li, ri = (rng.rand(32, 48, 3) * 255).astype(np.uint8), (
            rng.rand(32, 48, 3) * 255
        ).astype(np.uint8)
        Image.fromarray(li).save(ddir / "L" / f"{i}.png")
        Image.fromarray(ri).save(ddir / "R" / f"{i}.png")
        data.write_pfm(str(ddir / "D" / f"{i}.pfm"), rng.rand(32, 48).astype(np.float32) * 30)
        lines.append(f"L/{i}.png R/{i}.png D/{i}.pfm")
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(lines))

    ds = data.StereoDataset(
        str(ddir), str(lst), str(lst), dataset_name="SceneFlow", mode="train"
    )
    assert len(ds) == 3
    s = ds[1]
    assert s["img_left"].shape == (32, 48, 3)
    assert s["gt_disp"].shape == (32, 48)

    loader = data.DataLoader(
        ds, batch_size=2, shuffle=True, num_workers=2, seed=0,
        transform_with_rng=lambda s, rng: data.transforms.train_transform(
            s, rng, crop=(16, 32)
        ),
    )
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["img_left"].shape == (2, 16, 32, 3)
    assert b["gt_disp"].shape == (2, 16, 32, 1)
    # deterministic across re-iteration (same epoch)
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b["img_left"], b2["img_left"])
    loader.set_epoch(1)
    b3 = next(iter(loader))
    assert not np.array_equal(b["img_left"], b3["img_left"])


def test_loader_worker_error_propagates():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    loader = data.DataLoader(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(iter(loader))


def test_random_color_same_jitter_both_views():
    """Left and right must receive IDENTICAL photometric parameters
    (reference RandomContrast etc. draw once per sample)."""
    rng = np.random.default_rng(0)
    img = np.full((8, 8, 3), 100.0, np.float32)
    for seed in range(20):
        s = {"img_left": img.copy(), "img_right": img.copy()}
        out = data.random_color(s, np.random.default_rng(seed))
        np.testing.assert_array_equal(out["img_left"], out["img_right"])


def test_loader_bounded_prefetch():
    """The loader must not decode the whole epoch ahead of the consumer."""
    import threading
    import time as _t

    started = [0]
    lock = threading.Lock()

    class Tracking:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                started[0] += 1
            return {"img_left": np.zeros((4, 4, 3), np.float32),
                    "img_right": np.zeros((4, 4, 3), np.float32)}

    prefetch = 2
    loader = data.DataLoader(
        Tracking(), batch_size=4, num_workers=2, prefetch=prefetch
    )
    it = iter(loader)
    next(it)                      # consume one batch
    _t.sleep(0.3)                 # give the producer time to run ahead
    # decode-ahead bound: consumed(1) + queued(prefetch) + in-flight
    # future-lists (prefetch+1) batches — far below the 16-batch epoch
    assert started[0] <= (1 + prefetch + prefetch + 1) * 4, started[0]
    for _ in it:                  # drain cleanly
        pass
    assert started[0] == 64


def test_prefetch_to_device():
    import jax

    batches = [
        {"img_left": np.ones((2, 4, 4, 3), np.float32) * i, "left_name": ["x"]}
        for i in range(4)
    ]
    out = list(data.prefetch_to_device(batches, size=2))
    assert len(out) == 4
    assert isinstance(out[0]["img_left"], jax.Array)
    np.testing.assert_allclose(np.asarray(out[2]["img_left"]), 2.0)
    assert out[0]["left_name"] == ["x"]


def test_gt_normal_rides_crop_pad_flip():
    # reference transforms.py:35-95,149-150: gt_normal is cropped/padded/
    # flipped exactly like disparity
    rng = np.random.default_rng(0)
    s = {
        "img_left": np.ones((100, 200, 3), np.float32),
        "img_right": np.ones((100, 200, 3), np.float32),
        "gt_disp": np.ones((100, 200), np.float32),
        "gt_normal": np.ones((100, 200, 3), np.float32),
    }
    out = data.random_crop(dict(s), 64, 128, rng)
    assert out["gt_normal"].shape == (64, 128, 3)
    out2 = data.random_crop(dict(s), 128, 256, rng)
    assert out2["gt_normal"].shape == (128, 256, 3)
    assert (out2["gt_normal"][:28] == 0).all()       # top pad
    assert (out2["gt_normal"][:, 200:] == 0).all()   # right pad
    # flip: find a seed where the flip branch triggers and check all keys
    marked = dict(s)
    marked["gt_normal"] = np.arange(100 * 200 * 3, dtype=np.float32).reshape(
        100, 200, 3
    )
    marked["gt_disp"] = np.arange(100 * 200, dtype=np.float32).reshape(100, 200)
    flipped = data.random_vertical_flip(
        {k: v.copy() for k, v in marked.items()}, np.random.default_rng(1)
    )
    if (flipped["gt_disp"] != marked["gt_disp"]).any():
        np.testing.assert_array_equal(
            flipped["gt_normal"], np.flipud(marked["gt_normal"])
        )


def test_lighting_matches_reference_formula():
    # torch re-implementation of preprocess.py:129-148 (per-channel add of
    # eigvec @ (alpha * eigval)), same alpha draw
    import torch

    rng = np.random.default_rng(0)
    alpha = rng.normal(0, 0.1, size=3).astype(np.float32)
    img = np.random.RandomState(1).rand(8, 8, 3).astype(np.float32)
    eigval = torch.tensor(data.transforms.IMAGENET_PCA_EIGVAL)
    eigvec = torch.tensor(data.transforms.IMAGENET_PCA_EIGVEC)
    a = torch.tensor(alpha)
    rgb = (
        eigvec.clone()
        .mul(a.view(1, 3).expand(3, 3))
        .mul(eigval.view(1, 3).expand(3, 3))
        .sum(1)
        .squeeze()
    )
    want = (
        torch.from_numpy(img).permute(2, 0, 1)
        + rgb.view(3, 1, 1).expand(3, 8, 8)
    ).permute(1, 2, 0).numpy()

    s = {"img_left": img.copy(), "img_right": img.copy()}
    out = data.lighting(s, np.random.default_rng(0), alphastd=0.1)
    np.testing.assert_allclose(out["img_left"], want, atol=1e-6)
    np.testing.assert_allclose(out["img_right"], want, atol=1e-6)
    # alphastd=0 is the identity (reference :139-140)
    s2 = {"img_left": img.copy(), "img_right": img.copy()}
    out2 = data.lighting(s2, np.random.default_rng(0), alphastd=0.0)
    np.testing.assert_array_equal(out2["img_left"], img)


def test_random_rescale():
    img = np.random.RandomState(0).rand(20, 30, 3).astype(np.float32) * 255
    disp = np.random.RandomState(1).rand(20, 30).astype(np.float64) * 50
    s = {"img_left": img.copy(), "img_right": img.copy(), "gt_disp": disp.copy()}
    out = data.random_rescale(s, (40, 60))
    assert out["img_left"].shape == (40, 60, 3)
    assert out["img_left"].dtype == np.float32
    # constant image stays constant under bilinear resize
    c = {"img_left": np.full((10, 10, 3), 7.0, np.float32),
         "img_right": np.full((10, 10, 3), 7.0, np.float32),
         "gt_disp": disp.copy()}
    cout = data.random_rescale(c, (17, 23))
    np.testing.assert_allclose(cout["img_left"], 7.0, rtol=1e-5)
    # reference quirk (preprocess.py:246-250): disparity is cast, NOT resized
    assert cout["gt_disp"].shape == (20, 30)
    assert cout["gt_disp"].dtype == np.float32


def test_decoded_sample_cache_parity_and_invalidation(tmp_path):
    """data/cache.py: cached decode is bit-exact vs direct decode (miss
    AND hit), and an mtime change invalidates the entry."""
    import os
    import time

    from PIL import Image

    ddir = tmp_path / "dataroot"
    (ddir / "L").mkdir(parents=True)
    (ddir / "R").mkdir()
    (ddir / "D").mkdir()
    rng = np.random.RandomState(3)
    lines = []
    for i in range(2):
        li = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        ri = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        Image.fromarray(li).save(ddir / "L" / f"{i}.png")
        Image.fromarray(ri).save(ddir / "R" / f"{i}.png")
        data.write_pfm(str(ddir / "D" / f"{i}.pfm"),
                       rng.rand(32, 48).astype(np.float32) * 30)
        lines.append(f"L/{i}.png R/{i}.png D/{i}.pfm")
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(lines))

    cdir = str(tmp_path / "cache")
    plain = data.StereoDataset(str(ddir), str(lst), str(lst),
                               dataset_name="SceneFlow", mode="train")
    cached = data.StereoDataset(str(ddir), str(lst), str(lst),
                                dataset_name="SceneFlow", mode="train",
                                cache_dir=cdir)
    for i in range(2):
        want = plain[i]
        got_miss = cached[i]   # populates the cache
        got_hit = cached[i]    # serves from it
        for k in ("img_left", "img_right", "gt_disp"):
            np.testing.assert_array_equal(got_miss[k], want[k])
            np.testing.assert_array_equal(got_hit[k], want[k])
            assert got_hit[k].dtype == want[k].dtype
    n_entries = sum(len(fs) for _, _, fs in os.walk(cdir))
    assert n_entries == 6  # 2 samples x (left, right, disp)

    # rewrite one source image -> its entry must invalidate (new key)
    li2 = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    time.sleep(0.01)  # ensure mtime_ns moves
    Image.fromarray(li2).save(ddir / "L" / "0.png")
    s = cached[0]
    np.testing.assert_array_equal(s["img_left"], plain[0]["img_left"])
    assert sum(len(fs) for _, _, fs in os.walk(cdir)) == 7


def test_decoded_sample_cache_through_loader(tmp_path):
    """Cached and uncached datasets produce bit-identical augmented
    batches through the production DataLoader + train_transform."""
    from PIL import Image

    ddir = tmp_path / "dataroot"
    (ddir / "L").mkdir(parents=True)
    (ddir / "R").mkdir()
    (ddir / "D").mkdir()
    rng = np.random.RandomState(4)
    lines = []
    for i in range(4):
        Image.fromarray((rng.rand(32, 48, 3) * 255).astype(np.uint8)).save(
            ddir / "L" / f"{i}.png")
        Image.fromarray((rng.rand(32, 48, 3) * 255).astype(np.uint8)).save(
            ddir / "R" / f"{i}.png")
        data.write_pfm(str(ddir / "D" / f"{i}.pfm"),
                       rng.rand(32, 48).astype(np.float32) * 30)
        lines.append(f"L/{i}.png R/{i}.png D/{i}.pfm")
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(lines))

    def make_loader(cache_dir):
        ds = data.StereoDataset(str(ddir), str(lst), str(lst),
                                dataset_name="SceneFlow", mode="train",
                                cache_dir=cache_dir)
        return data.DataLoader(
            ds, batch_size=2, shuffle=True, num_workers=2, seed=0,
            transform_with_rng=lambda s, rng_: data.transforms.train_transform(
                s, rng_, crop=(16, 32)),
        )

    a = list(make_loader(None))
    b = list(make_loader(str(tmp_path / "cache")))   # epoch 1: misses
    c = list(make_loader(str(tmp_path / "cache")))   # epoch 1 again: hits
    assert len(a) == len(b) == len(c) == 2
    for ba, bb, bc in zip(a, b, c):
        for k in ("img_left", "img_right", "gt_disp"):
            np.testing.assert_array_equal(ba[k], bb[k])
            np.testing.assert_array_equal(ba[k], bc[k])
