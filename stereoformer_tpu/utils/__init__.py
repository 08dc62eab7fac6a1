"""Shared utilities: logging, meters, visualisation."""

from .cache import cache_entries, enable_persistent_cache
from .common import AverageMeter, get_logger, load_loss_scheme
from .viz import disp_error_image, kitti_colormap, tensorboard_disparity_images

__all__ = [
    "AverageMeter",
    "cache_entries",
    "enable_persistent_cache",
    "get_logger",
    "load_loss_scheme",
    "disp_error_image",
    "kitti_colormap",
    "tensorboard_disparity_images",
]
