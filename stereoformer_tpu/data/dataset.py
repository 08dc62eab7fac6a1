"""List-file stereo datasets (same ``filenames/`` format as the reference).

Reference semantics: ``dataloader/SceneflowLoader.py:13-144`` — space
separated ``left right [disp]`` lines; named dataset dicts for
SceneFlow / KITTI2012 / KITTI2015 / KITTI_mix; val/test resizes *images*
to 576×960 (disparity kept at native resolution, the eval step rescales
predictions back with ``scale_disp``); KITTI pseudo-GT path rewriting.

A synthetic ``DummyStereoDataset`` (random textured scenes with exact
ground-truth disparity by construction) backs tests and CI overfit runs —
the reference repo has no equivalent, but its missing-blob list files
(SURVEY §2.10) make one necessary.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .file_io import read_disp, read_img, read_text_lines

IMG_SIZE = (540, 960)     # SceneflowLoader.py:31
SCALE_SIZE = (576, 960)   # SceneflowLoader.py:32 (val/test image resize)

_DATASET_LISTS = {
    # mode-keyed list files relative to a filenames/ root (SceneflowLoader.py:41-60)
    "KITTI2012": {
        "train": "KITTI_2012_train.txt",
        "train_all": "KITTI_2012_train_all.txt",
        "val": "KITTI_2012_val.txt",
        "test": "KITTI_2012_test.txt",
    },
    "KITTI2015": {
        "train": "KITTI_2015_train.txt",
        "train_all": "KITTI_2015_train_all.txt",
        "val": "KITTI_2015_val.txt",
        "test": "KITTI_2015_test.txt",
    },
    "KITTI_mix": {
        "train": "KITTI_mix_train.txt",
        "val": "KITTI_mix_val.txt",
        "test": "KITTI_2015_test.txt",
    },
    "ETH3D": {
        "train": "ETH3D.list",
        "val": "ETH3D_val.list",
        "test": "ETH3D_test.list",
    },
    "ETH3D_mix": {
        "train": "ETH3D_mix.list",
        "val": "ETH3D_mix_val.list",
        "test": "ETH3D_test.list",
    },
    "Middlebury": {
        "train": "Middleburry.list",   # upstream spelling
        "val": "Middleburry_val.list",
        "test": "Middleburry_test.list",
    },
}


def _resize_img(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Bilinear image resize via PIL (reference uses skimage;
    SceneflowLoader.py:124-130)."""
    from PIL import Image

    h, w = size
    out = np.stack(
        [
            np.array(
                Image.fromarray(img[..., c]).resize((w, h), Image.BILINEAR)
            )
            for c in range(img.shape[-1])
        ],
        axis=-1,
    )
    return out.astype(np.float32)


@dataclass
class SampleSpec:
    left: str
    right: str
    disp: Optional[str]
    pseudo_disp: Optional[str] = None
    left_name: Optional[str] = None


class StereoDataset:
    """Indexable dataset of sample dicts (numpy HWC float32)."""

    def __init__(
        self,
        data_dir: str,
        train_datalist: str,
        test_datalist: str,
        dataset_name: str = "SceneFlow",
        mode: str = "train",
        save_filename: bool = False,
        load_pseudo_gt: bool = False,
        transform=None,
        filenames_dir: Optional[str] = None,
        scale_size: tuple[int, int] = SCALE_SIZE,
        cache_dir: Optional[str] = None,
    ):
        # opt-in decoded-sample disk cache (data/cache.py): epoch ≥2
        # skips PNG/PFM decode entirely, bit-exact vs the decode path
        from .cache import open_cache

        self._cache = open_cache(cache_dir)
        self.data_dir = data_dir
        self.mode = mode
        self.dataset_name = dataset_name
        self.save_filename = save_filename
        self.transform = transform
        self.img_size = IMG_SIZE
        self.scale_size = scale_size

        if dataset_name == "SceneFlow" or dataset_name not in _DATASET_LISTS:
            list_file = train_datalist if mode == "train" else test_datalist
        else:
            name = _DATASET_LISTS[dataset_name][mode]
            list_file = os.path.join(filenames_dir or "filenames", name)

        self.samples: list[SampleSpec] = []
        for line in read_text_lines(list_file):
            splits = line.split()
            left, right = splits[:2]
            disp = splits[2] if len(splits) > 2 else None
            pseudo = None
            if load_pseudo_gt and disp is not None:
                # KITTI pseudo-GT rewriting (SceneflowLoader.py:91-101)
                if "disp_occ_0" in disp:
                    pseudo = disp.replace("disp_occ_0", "disp_occ_0_pseudo_gt")
                elif "disp_occ" in disp:
                    pseudo = disp.replace("disp_occ", "disp_occ_pseudo_gt")
                else:
                    raise NotImplementedError(disp)
            self.samples.append(
                SampleSpec(
                    left=os.path.join(data_dir, left),
                    right=os.path.join(data_dir, right),
                    disp=os.path.join(data_dir, disp) if disp else None,
                    pseudo_disp=os.path.join(data_dir, pseudo) if pseudo else None,
                    left_name=left.split("/", 1)[-1] if save_filename else None,
                )
            )

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        spec = self.samples[index]
        c = self._cache
        rimg = c.img if c is not None else read_img
        rdisp = c.disp if c is not None else read_disp
        sample: dict = {
            "img_left": rimg(spec.left),
            "img_right": rimg(spec.right),
        }
        if spec.left_name:
            sample["left_name"] = spec.left_name
        subset = "subset" in self.dataset_name
        if spec.disp:
            sample["gt_disp"] = rdisp(spec.disp, subset=subset)
        if spec.pseudo_disp:
            sample["pseudo_disp"] = rdisp(spec.pseudo_disp, subset=subset)
        if self.mode in ("val", "test"):
            sample["img_left"] = _resize_img(sample["img_left"], self.scale_size)
            sample["img_right"] = _resize_img(sample["img_right"], self.scale_size)
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class DummyStereoDataset:
    """Synthetic stereo pairs with exact ground truth.

    Each scene is smooth random texture; the right image is the left
    shifted by a smoothly varying disparity field (per-row continuous
    warp), so gt_disp is correct by construction.  Used by tests, the
    overfit harness, and ``--dataset dummy``.
    """

    def __init__(
        self,
        length: int = 16,
        height: int = 384,
        width: int = 768,
        max_disp: float = 48.0,
        mode: str = "train",
        transform=None,
        seed: int = 0,
    ):
        self.length = length
        self.h, self.w = height, width
        self.max_disp = max_disp
        self.mode = mode
        self.transform = transform
        self.seed = seed
        self.img_size = (height, width)
        self.scale_size = (height, width)
        # per-index generation is deterministic (rng seeded by index only),
        # so raw samples can be cached across epochs — the loader's
        # per-(seed, epoch, index) augmentation RNG still varies.  Capped
        # (≈8 MB per 384×768 sample); thread-safe under the GIL (worst
        # case a sample is generated twice).
        self._cache: dict = {}
        self._cache_max = min(
            length, int(os.environ.get("DUMMY_CACHE_SAMPLES", "192"))
        )
        yy, xx = np.mgrid[: self.h, : self.w].astype(np.float32)
        self._yy, self._xx = yy, xx

    def __len__(self):
        return self.length

    def _texture(self, rng):
        # smooth multi-scale random texture, 0..255
        img = np.zeros((self.h, self.w), np.float32)
        yy, xx = self._yy, self._xx
        for period in (7, 17, 41, 97):
            phase = rng.uniform(0, 2 * np.pi, (2,))
            img += rng.uniform(0.5, 1.0) * (
                np.sin(2 * np.pi * xx / period + phase[0])
                * np.sin(2 * np.pi * yy / period + phase[1])
            )
        img -= img.min()
        img *= 255.0 / max(img.max(), 1e-6)
        return np.repeat(img[..., None], 3, axis=-1)

    def _generate(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + index)
        left = self._texture(rng)
        # smooth disparity field in [4, max_disp]
        cy, cx = rng.uniform(0.2, 0.8, 2)
        yy, xx = self._yy, self._xx
        r = np.sqrt(((yy / self.h) - cy) ** 2 + ((xx / self.w) - cx) ** 2)
        disp = 4.0 + (self.max_disp - 4.0) * np.exp(-4.0 * r * r)
        # right(x) = left(x + disp): sample left at x + d
        src = xx + disp
        x0 = np.clip(np.floor(src).astype(np.int64), 0, self.w - 1)
        x1 = np.clip(x0 + 1, 0, self.w - 1)
        t = (src - x0)[..., None]
        rows = np.arange(self.h)[:, None]
        right = left[rows, x0] * (1 - t) + left[rows, x1] * t
        return {
            "img_left": left.astype(np.float32),
            "img_right": right.astype(np.float32),
            "gt_disp": disp.astype(np.float32),
        }

    def __getitem__(self, index: int) -> dict:
        raw = self._cache.get(index)
        if raw is None:
            raw = self._generate(index)
            if len(self._cache) < self._cache_max:
                self._cache[index] = raw
        # hand out copies: downstream transforms may mutate in place
        sample = {k: v.copy() for k, v in raw.items()}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
