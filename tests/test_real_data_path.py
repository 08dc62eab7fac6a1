"""The PRODUCTION data path, end-to-end on disk (VERDICT round-1 item 5).

Writes reference-format fixtures — 8-bit PNG stereo pairs + PFM
disparities + space-separated list files (SceneflowLoader.py:13-105
format) — then drives ``cli/train.py --dataset SceneFlow`` through
StereoDataset → threaded DataLoader (+native PFM decode when built) →
train → validate → checkpoint.  Plus golden-value decoder fixtures for
PFM endianness/flip and KITTI PNG÷256 (utils/file_io.py:11-107).
"""

import glob
import os
import struct

import numpy as np
import pytest

from stereoformer_tpu import data


def _make_sceneflow_tree(root, n_train=4, n_val=2, H=64, W=128):
    """SceneFlow-style directory tree + list files; returns their paths.

    Pairs come from DummyStereoDataset so ground truth is geometrically
    consistent (the PNG quantisation adds <1/255 photometric noise).
    """
    from PIL import Image

    ds = data.DummyStereoDataset(length=n_train + n_val, height=H, width=W,
                                 max_disp=24.0)
    lines = []
    for i in range(n_train + n_val):
        s = ds[i]
        rel_l = f"frames_finalpass/TRAIN/A/{i:04d}/left/0006.png"
        rel_r = f"frames_finalpass/TRAIN/A/{i:04d}/right/0006.png"
        rel_d = f"disparity/TRAIN/A/{i:04d}/left/0006.pfm"
        for rel in (rel_l, rel_r, rel_d):
            os.makedirs(os.path.join(root, os.path.dirname(rel)), exist_ok=True)
        Image.fromarray(s["img_left"].astype(np.uint8)).save(
            os.path.join(root, rel_l))
        Image.fromarray(s["img_right"].astype(np.uint8)).save(
            os.path.join(root, rel_r))
        data.write_pfm(os.path.join(root, rel_d), s["gt_disp"])
        lines.append(f"{rel_l} {rel_r} {rel_d}")
    trainlist = os.path.join(root, "train.list")
    vallist = os.path.join(root, "val.list")
    with open(trainlist, "w") as f:
        f.write("\n".join(lines[:n_train]) + "\n")
    with open(vallist, "w") as f:
        f.write("\n".join(lines[n_train:]) + "\n")
    return trainlist, vallist


def test_stereo_dataset_reads_fixtures(tmp_path):
    trainlist, vallist = _make_sceneflow_tree(str(tmp_path))
    train = data.StereoDataset(str(tmp_path), trainlist, vallist,
                               dataset_name="SceneFlow", mode="train")
    assert len(train) == 4
    s = train[0]
    assert s["img_left"].shape == (64, 128, 3)
    assert s["img_left"].dtype == np.float32
    assert s["gt_disp"].shape == (64, 128)
    assert s["gt_disp"].min() >= 4.0 - 1e-5  # DummyStereoDataset field range
    # val mode resizes images to scale_size, keeps gt at native res
    # (SceneflowLoader.py:124-130)
    val = data.StereoDataset(str(tmp_path), trainlist, vallist,
                             dataset_name="SceneFlow", mode="val",
                             scale_size=(32, 64))
    v = val[0]
    assert v["img_left"].shape == (32, 64, 3)
    assert v["gt_disp"].shape == (64, 128)


def test_cli_train_on_real_sceneflow_path(tmp_path):
    """cli/train.py through the real StereoDataset: 1 epoch of training on
    disk-decoded pairs, validation with scale_disp rescale, checkpoint."""
    from stereoformer_tpu.cli.train import main

    trainlist, vallist = _make_sceneflow_tree(str(tmp_path / "sf"))
    outf = str(tmp_path / "models")
    main([
        "--dataset", "SceneFlow",
        "--datapath", str(tmp_path / "sf"),
        "--trainlist", trainlist,
        "--vallist", vallist,
        "--net", "LowCNN_gru",
        "--batch_size", "2", "--test_batch", "2",
        "--crop_h", "32", "--crop_w", "64",
        "--scale_h", "32", "--scale_w", "64",
        "--train_iters", "1", "--eval_iters", "1",
        "--epochs", "1",
        "--outf", outf, "--save_logdir", str(tmp_path / "logs"),
        "--workers", "2",          # exercise the threaded loader
        "--no_mesh",
    ])
    ckpts = glob.glob(os.path.join(outf, "LowCNN_gru_0_*"))
    assert len(ckpts) == 1, ckpts
    assert os.path.isdir(os.path.join(outf, "model_best"))
    log = open(os.path.join(outf, "train.log")).read()
    assert "Validate epoch" in log


# --- golden-value decoder fixtures -------------------------------------------

def _pfm_bytes(values_2x3: np.ndarray, little: bool) -> bytes:
    """Hand-assembled PFM: header + bottom-up scanline order."""
    h, w = values_2x3.shape
    scale = -1.0 if little else 1.0
    header = b"Pf\n" + f"{w} {h}\n".encode() + f"{scale}\n".encode()
    # PFM stores rows bottom-to-top: write flipud
    flipped = np.flipud(values_2x3).astype("<f4" if little else ">f4")
    return header + flipped.tobytes()


@pytest.mark.parametrize("little", [True, False])
def test_pfm_golden_endianness_and_flip(tmp_path, little):
    want = np.array([[1.5, -2.25, 3.0], [4.0, 5.5, -6.125]], np.float32)
    p = str(tmp_path / ("le.pfm" if little else "be.pfm"))
    with open(p, "wb") as f:
        f.write(_pfm_bytes(want, little))
    got, scale = data.read_pfm(p)
    assert scale == 1.0
    np.testing.assert_array_equal(got, want)
    # the production read_disp path (native decoder when built)
    np.testing.assert_array_equal(data.read_disp(p), want)


def test_pfm_golden_bytes_exact(tmp_path):
    """Byte-level check of one known float through the full header parse:
    1.0f little-endian == 00 00 80 3f."""
    p = str(tmp_path / "one.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n1 1\n-1.0\n" + struct.pack("<f", 1.0))
    got, _ = data.read_pfm(p)
    assert got.shape == (1, 1) and got[0, 0] == 1.0


def test_kitti_png_golden(tmp_path):
    """KITTI 16-bit PNG: raw value 12800 → 50.0 px (÷256,
    utils/file_io.py KITTI semantics)."""
    from PIL import Image

    raw = np.array([[12800, 0], [256, 65535]], np.uint16)
    p = str(tmp_path / "kitti.png")
    Image.fromarray(raw).save(p)
    got = data.read_disp(p)
    np.testing.assert_allclose(
        got, np.array([[50.0, 0.0], [1.0, 65535 / 256.0]], np.float32))


def test_subset_negation(tmp_path):
    """SceneFlow *subset* disparities are stored negative and flipped
    positive on read (file_io.py:17-31)."""
    d = -np.abs(np.random.RandomState(0).rand(6, 8).astype(np.float32)) * 30
    p = str(tmp_path / "neg.pfm")
    data.write_pfm(p, d)
    got = data.read_disp(p, subset=True)
    np.testing.assert_allclose(got, -d, atol=1e-6)


def _make_kitti_tree(root, n_train=4, n_val=2, H=64, W=128):
    """KITTI2015-format tree: 8-bit PNG pairs + 16-bit PNG disparities
    (value = disp·256, file_io read_disp ÷256 semantics) + the canonical
    filenames/ registry layout (SceneflowLoader.py:41-60)."""
    from PIL import Image

    ds = data.DummyStereoDataset(length=n_train + n_val, height=H, width=W,
                                 max_disp=24.0)
    for sub in ("training/image_2", "training/image_3",
                "training/disp_occ_0", "filenames"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    lines = []
    for i in range(n_train + n_val):
        s = ds[i]
        nm = f"{i:06d}_10.png"
        Image.fromarray(s["img_left"].astype(np.uint8)).save(
            os.path.join(root, "training/image_2", nm))
        Image.fromarray(s["img_right"].astype(np.uint8)).save(
            os.path.join(root, "training/image_3", nm))
        d16 = (s["gt_disp"] * 256.0).round().astype(np.uint16)
        Image.fromarray(d16).save(
            os.path.join(root, "training/disp_occ_0", nm))
        lines.append(
            f"training/image_2/{nm} training/image_3/{nm} "
            f"training/disp_occ_0/{nm}"
        )
    for name, sel in (("KITTI_2015_train.txt", lines[:n_train]),
                      ("KITTI_2015_val.txt", lines[n_train:])):
        with open(os.path.join(root, "filenames", name), "w") as f:
            f.write("\n".join(sel) + "\n")


def test_cli_train_on_kitti_path(tmp_path):
    """cli/train.py --dataset KITTI2015 with --filenames_dir: the KITTI
    16-bit-PNG÷256 decode + canonical list registry, end to end."""
    from stereoformer_tpu.cli.train import main

    root = str(tmp_path / "kitti")
    _make_kitti_tree(root)
    outf = str(tmp_path / "models")
    main([
        "--dataset", "KITTI2015",
        "--datapath", root,
        "--filenames_dir", os.path.join(root, "filenames"),
        "--net", "LowCNN_gru",
        "--batch_size", "2", "--test_batch", "2",
        "--crop_h", "32", "--crop_w", "64",
        "--scale_h", "32", "--scale_w", "64",
        "--train_iters", "1", "--eval_iters", "1",
        "--epochs", "1",
        "--outf", outf, "--save_logdir", str(tmp_path / "logs"),
        "--workers", "2",
        "--no_mesh",
    ])
    assert glob.glob(os.path.join(outf, "LowCNN_gru_0_*"))
    log = open(os.path.join(outf, "train.log")).read()
    assert "Validate epoch" in log


def _make_list_registry_tree(root, fnames_dir, dataset, list_names, rels,
                             H=32, W=64):
    """Fixture tree for a registry-driven dataset (ETH3D / Middlebury):
    PNG pairs + PFM GT at the list files' exact relative paths, plus
    truncated train/val list files under a filenames dir."""
    from PIL import Image

    ds = data.DummyStereoDataset(length=len(rels), height=H, width=W,
                                 max_disp=12.0)
    lines = []
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
        lines.append(f"{rel_l} {rel_r} {rel_d}")
    os.makedirs(fnames_dir, exist_ok=True)
    for name, sel in list_names:
        with open(os.path.join(fnames_dir, name), "w") as f:
            f.write("\n".join(sel(lines)) + "\n")


@pytest.mark.parametrize("dataset,train_list,val_list,scene", [
    ("ETH3D", "ETH3D.list", "ETH3D_val.list",
     ("ETH3D/training/{i}/im0.png", "ETH3D/training/{i}/im1.png",
      "ETH3D/disp/{i}/disp0GT.pfm")),
    ("Middlebury", "Middleburry.list", "Middleburry_val.list",
     ("MiddEval3/trainingH/{i}/im0.png", "MiddEval3/trainingH/{i}/im1.png",
      "MiddEval3/disp/{i}/disp0GT.pfm")),
])
def test_registry_dataset_reads_fixtures(tmp_path, dataset, train_list,
                                         val_list, scene):
    """ETH3D / Middlebury registries resolve their list files from
    --filenames_dir and decode PNG pairs + PFM GT (dataset.py
    _DATASET_LISTS; list layout matches the shipped filenames/*.list)."""
    root = str(tmp_path / "data")
    fnames = str(tmp_path / "filenames")
    rels = [tuple(p.format(i=f"scene_{i}") for p in scene) for i in range(3)]
    _make_list_registry_tree(
        root, fnames, dataset,
        [(train_list, lambda l: l[:2]), (val_list, lambda l: l[2:])], rels)
    train = data.StereoDataset(root, "", "", dataset_name=dataset,
                               mode="train", filenames_dir=fnames)
    assert len(train) == 2
    s = train[0]
    assert s["img_left"].shape == (32, 64, 3)
    assert s["gt_disp"].shape == (32, 64)
    assert np.isfinite(s["gt_disp"]).all() and s["gt_disp"].min() > 0
    val = data.StereoDataset(root, "", "", dataset_name=dataset, mode="val",
                             filenames_dir=fnames, scale_size=(32, 64))
    assert len(val) == 1
    v = val[0]
    assert v["img_left"].shape == (32, 64, 3)
