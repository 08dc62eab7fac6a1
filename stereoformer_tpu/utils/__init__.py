"""Shared utilities: logging, meters, visualisation."""

from .common import AverageMeter, get_logger, load_loss_scheme
from .viz import disp_error_image, kitti_colormap, tensorboard_disparity_images

__all__ = [
    "AverageMeter",
    "get_logger",
    "load_loss_scheme",
    "disp_error_image",
    "kitti_colormap",
    "tensorboard_disparity_images",
]
