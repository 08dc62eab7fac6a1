"""CLI end-to-end smoke on the CPU mesh: two tiny epochs on synthetic
data, checkpoints written, best tracked."""

import glob
import os

import numpy as np

from stereoformer_tpu.cli.train import main


def test_cli_dummy_end_to_end(tmp_path):
    outf = str(tmp_path / "models")
    main(
        [
            "--dataset", "dummy",
            "--net", "LowCNN_gru",
            "--batch_size", "2",
            "--test_batch", "2",
            "--crop_h", "32",
            "--crop_w", "64",
            "--train_iters", "2",
            "--eval_iters", "2",
            "--epochs", "2",
            "--outf", outf,
            "--save_logdir", str(tmp_path / "logs"),
            "--workers", "0",
            "--no_mesh",
        ]
    )
    ckpts = glob.glob(os.path.join(outf, "LowCNN_gru_0_*"))
    assert len(ckpts) == 2, ckpts
    assert os.path.isdir(os.path.join(outf, "model_best"))
    assert os.path.isfile(os.path.join(outf, "train.log"))


def test_cli_resume(tmp_path):
    """--resume picks up the latest checkpoint and continues the epoch
    numbering."""
    outf = str(tmp_path / "models")
    args = [
        "--dataset", "dummy", "--net", "LowCNN_gru",
        "--batch_size", "2", "--test_batch", "2",
        "--crop_h", "32", "--crop_w", "64",
        "--train_iters", "1", "--eval_iters", "1",
        "--outf", outf, "--save_logdir", str(tmp_path / "logs"),
        "--workers", "0", "--no_mesh",
    ]
    main(args + ["--epochs", "1"])
    ckpts1 = set(glob.glob(os.path.join(outf, "LowCNN_gru_0_*")))
    assert len(ckpts1) == 1
    main(args + ["--epochs", "2", "--resume"])
    ckpts2 = set(glob.glob(os.path.join(outf, "LowCNN_gru_0_*")))
    # resumed run trains only epoch 1 (epoch 0 already done)
    new = ckpts2 - ckpts1
    assert len(new) == 1 and "_0_1_" in list(new)[0]


def test_cli_evaluate_dummy(capsys):
    from stereoformer_tpu.cli.evaluate import main as eval_main

    result = eval_main([
        "--dataset", "dummy", "--net", "LowCNN_gru",
        "--crop_h", "32", "--crop_w", "64", "--iters", "1",
        "--test_batch", "2", "--workers", "0",
    ])
    assert result["images"] == 8
    assert np.isfinite(result["EPE"]) and 0 <= result["P1"] <= 1


def test_cli_analysis_dummy(tmp_path):
    """Analysis CLI end-to-end: save a checkpoint, probe a synthetic pair."""
    from PIL import Image

    from stereoformer_tpu.cli.analysis import main as analysis_main
    from stereoformer_tpu.data import DummyStereoDataset, write_pfm

    outf = str(tmp_path / "models")
    main([
        "--dataset", "dummy", "--net", "LowCNN_gru",
        "--batch_size", "2", "--test_batch", "2",
        "--crop_h", "32", "--crop_w", "64",
        "--train_iters", "1", "--eval_iters", "1", "--epochs", "1",
        "--outf", outf, "--save_logdir", str(tmp_path / "logs"),
        "--workers", "0", "--no_mesh",
    ])
    ds = DummyStereoDataset(length=1, height=32, width=64, max_disp=12)
    s = ds[0]
    lp, rp, dp = (str(tmp_path / n) for n in ("l.png", "r.png", "d.pfm"))
    Image.fromarray(s["img_left"].astype("uint8")).save(lp)
    Image.fromarray(s["img_right"].astype("uint8")).save(rp)
    write_pfm(dp, s["gt_disp"])
    out_npz = str(tmp_path / "probe.npz")
    analysis_main([
        "--ckpt", os.path.join(outf, "model_best"),
        "--net", "LowCNN_gru", "--left", lp, "--right", rp,
        "--disp", dp, "--pixel", "10", "20", "--iters", "1",
        "--out", out_npz,
    ])
    assert os.path.exists(out_npz)
    data = np.load(out_npz)
    assert "disp_final" in data and np.isfinite(data["disp_final"]).all()


def test_cli_infer_dummy(tmp_path):
    """Infer CLI: odd-sized inputs (padder), PFM output, error map vs GT."""
    from PIL import Image

    from stereoformer_tpu.cli.infer import main as infer_main
    from stereoformer_tpu.data import DummyStereoDataset, read_pfm, write_pfm

    ds = DummyStereoDataset(length=1, height=30, width=61, max_disp=10)
    s = ds[0]
    lp, rp, gp = (str(tmp_path / n) for n in ("l.png", "r.png", "gt.pfm"))
    Image.fromarray(s["img_left"].astype("uint8")).save(lp)
    Image.fromarray(s["img_right"].astype("uint8")).save(rp)
    write_pfm(gp, s["gt_disp"])
    out = str(tmp_path / "disp.pfm")
    err = str(tmp_path / "err.png")
    disp = infer_main([
        "--left", lp, "--right", rp, "--out", out,
        "--gt", gp, "--error-out", err, "--iters", "1",
    ])
    assert disp.shape == (30, 61)
    back, _ = read_pfm(out)
    np.testing.assert_allclose(back, disp, atol=1e-5)
    assert os.path.exists(err)
