"""Logger, loss-scheme config loading, meters.

Reference: ``utils/common.py:8-28`` (logger + YAML/JSON loss scheme),
``utils/AverageMeter.py:1-16``.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Optional


def get_logger(logfile: Optional[str] = None, name: str = "stereoformer_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger
    if not logger.handlers:
        fmt = logging.Formatter(
            "%(asctime)s [%(levelname)s] %(message)s", "%Y-%m-%d %H:%M:%S"
        )
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if logfile:
        fh = logging.FileHandler(logfile)
        fh.setFormatter(logger.handlers[0].formatter)
        logger.addHandler(fh)
    return logger


def load_loss_scheme(path: str) -> dict:
    """Loss-schedule JSON: {"round", "loss_scale", "loss_weights",
    "epoches"} (config/loss_config_disp.json:1-7, loaded by
    utils/common.py:8-13)."""
    with open(path) as f:
        return json.load(f)


class AverageMeter:
    """val/avg/sum/count accumulator (utils/AverageMeter.py)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
