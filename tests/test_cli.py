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
