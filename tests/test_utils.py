"""Utility layer: meters, viz, loss scheme."""

import json
import numpy as np

from stereoformer_tpu.utils import (
    AverageMeter,
    disp_error_image,
    load_loss_scheme,
    tensorboard_disparity_images,
)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert m.count == 4
    np.testing.assert_allclose(m.avg, (2 + 12) / 4)


def test_disp_error_image_colors():
    gt = np.full((4, 4), 10.0, np.float32)
    pred = gt.copy()
    pred[0, 0] = 100.0   # huge error -> dark red bucket
    pred[1, 1] = 10.05   # tiny error -> dark blue bucket
    gt[2, 2] = 0.0       # invalid -> black
    img = disp_error_image(pred, gt)
    assert img.shape == (4, 4, 3)
    assert tuple(img[0, 0]) == (215, 48, 39)  # score=min(90/3, 9/0.05/10)=30 -> [24,48)
    assert tuple(img[1, 1]) == (49, 54, 149)
    assert tuple(img[2, 2]) == (0, 0, 0)


def test_tensorboard_images_noop_without_writer():
    tensorboard_disparity_images(None, "t", np.zeros((4, 4, 3)), np.zeros((4, 4)), np.ones((4, 4)), 0)


class FakeWriter:
    def __init__(self):
        self.calls = []

    def add_image(self, tag, img, step, dataformats=None):
        self.calls.append((tag, np.asarray(img).shape, dataformats))


def test_tensorboard_images_with_writer():
    w = FakeWriter()
    tensorboard_disparity_images(
        w, "val", np.random.rand(8, 8, 3).astype(np.float32),
        np.random.rand(8, 8).astype(np.float32) * 20,
        np.random.rand(8, 8).astype(np.float32) * 20, 3,
    )
    tags = [c[0] for c in w.calls]
    assert tags == ["val/left", "val/pred", "val/gt", "val/error"]


def test_load_loss_scheme(tmp_path):
    p = tmp_path / "loss.json"
    p.write_text(json.dumps({"round": 1, "epoches": [70]}))
    assert load_loss_scheme(str(p))["round"] == 1
