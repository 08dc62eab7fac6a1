"""CLI end-to-end smoke on the CPU mesh: two tiny epochs on synthetic
data, checkpoints written, best tracked."""

import glob
import os

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
