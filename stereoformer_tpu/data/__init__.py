"""Data layer: list-file datasets, IO, transforms, loaders."""

from . import transforms
from .dataset import DummyStereoDataset, StereoDataset, IMG_SIZE, SCALE_SIZE
from .file_io import read_disp, read_img, read_pfm, read_text_lines, write_pfm
from .loader import DataLoader, num_workers_default, prefetch_to_device
from .transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    lighting,
    normalize,
    random_color,
    random_crop,
    random_rescale,
    random_vertical_flip,
    to_unit,
    train_transform,
    val_transform,
)

__all__ = [
    "transforms",
    "DummyStereoDataset",
    "StereoDataset",
    "IMG_SIZE",
    "SCALE_SIZE",
    "read_disp",
    "read_img",
    "read_pfm",
    "read_text_lines",
    "write_pfm",
    "DataLoader",
    "num_workers_default",
    "prefetch_to_device",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "lighting",
    "normalize",
    "random_color",
    "random_crop",
    "random_rescale",
    "random_vertical_flip",
    "to_unit",
    "train_transform",
    "val_transform",
]
