"""Sample-dict transforms with *explicit* PRNG (numpy Generator).

Reference semantics: ``dataloader/transforms.py:11-262``.  Samples are
dicts of numpy arrays: ``img_left``/``img_right`` [H, W, 3] float32,
optional ``gt_disp``/``pseudo_disp`` [H, W].  Unlike the reference
(module-level ``np.random``), every random transform takes a
``numpy.random.Generator`` so augmentation is reproducible and safely
parallel across loader workers.

Images stay NHWC float32 throughout (no CHW transpose): ``to_unit`` is
the ToTensor ÷255 step, ``normalize`` the ImageNet normalisation
(trainer_DLC_GRU.py:24-25).
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_IMG_KEYS = ("img_left", "img_right")
# gt_normal: [H, W, 3] surface-normal maps ride the same crop/pad/flip as
# disparity (reference transforms.py:35-95,149-150)
_DENSE_KEYS = ("img_left", "img_right", "gt_disp", "pseudo_disp", "gt_normal")


def to_unit(sample: dict) -> dict:
    """÷255 (transforms.py ToTensor, minus the CHW transpose)."""
    for k in _IMG_KEYS:
        sample[k] = sample[k].astype(np.float32) / 255.0
    return sample


def normalize(sample: dict, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> dict:
    for k in _IMG_KEYS:
        sample[k] = (sample[k] - mean) / std
    return sample


def random_crop(
    sample: dict, height: int, width: int,
    rng: np.random.Generator | None = None, validate: bool = False,
) -> dict:
    """Crop to (height, width); smaller inputs are padded top/right with
    zeros — the reference's top-pad semantics (transforms.py:75-104).
    Training picks a uniform offset, validation a centre crop."""
    H, W = sample["img_left"].shape[:2]
    if height > H or width > W:
        tp, rp = max(0, height - H), max(0, width - W)
        for k in _DENSE_KEYS:
            if k in sample and sample[k] is not None:
                pad = ((tp, 0), (0, rp)) + ((0, 0),) * (sample[k].ndim - 2)
                sample[k] = np.pad(sample[k], pad, mode="constant")
        H, W = sample["img_left"].shape[:2]
        if height <= H and width <= W:
            return random_crop(sample, height, width, rng, validate)
        return sample
    if validate or rng is None:
        ox, oy = (W - width) // 2, (H - height) // 2
    else:
        ox = int(rng.integers(0, W - width + 1))
        oy = int(rng.integers(0, H - height + 1))
    for k in _DENSE_KEYS:
        if k in sample and sample[k] is not None:
            sample[k] = sample[k][oy : oy + height, ox : ox + width]
    return sample


def random_vertical_flip(sample: dict, rng: np.random.Generator) -> dict:
    """flipud all dense keys with p=0.5 (transforms.py:140-156)."""
    if rng.random() < 0.5:
        for k in _DENSE_KEYS:
            if k in sample and sample[k] is not None:
                sample[k] = np.ascontiguousarray(np.flipud(sample[k]))
    return sample


# --- photometric augmentation on 0..255 float images ------------------------
# PIL-free re-implementations of torchvision.functional adjust_* as used by
# RandomColor (transforms.py:178-262); same parameter ranges.

def _adjust_contrast(img, f):
    # torchvision: blend with mean of grayscale
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    mean = gray.mean()
    return np.clip(f * img + (1 - f) * mean, 0, 255)


def _adjust_gamma(img, g):
    return np.clip(255.0 * (img / 255.0) ** g, 0, 255)


def _adjust_brightness(img, f):
    return np.clip(img * f, 0, 255)


def _adjust_saturation(img, f):
    gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
    return np.clip(f * img + (1 - f) * gray, 0, 255)


def _adjust_hue(img, h):
    # rotate hue via RGB->HSV->RGB on 0..1
    x = img / 255.0
    mx, mn = x.max(-1), x.min(-1)
    diff = mx - mn + 1e-12
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    hch = np.where(
        mx == r, ((g - b) / diff) % 6,
        np.where(mx == g, (b - r) / diff + 2, (r - g) / diff + 4),
    ) / 6.0
    s = np.where(mx > 0, diff / (mx + 1e-12), 0.0)
    hch = (hch + h) % 1.0
    i = np.floor(hch * 6)
    f = hch * 6 - i
    p, q, t = mx * (1 - s), mx * (1 - f * s), mx * (1 - (1 - f) * s)
    i = i.astype(np.int32) % 6
    out = np.stack(
        [
            np.choose(i, [mx, q, p, p, t, mx]),
            np.choose(i, [t, mx, mx, q, p, p]),
            np.choose(i, [p, p, t, mx, mx, q]),
        ],
        axis=-1,
    )
    return np.clip(out * 255.0, 0, 255)


def random_color(sample: dict, rng: np.random.Generator) -> dict:
    """Photometric jitter: with p=0.5 one random adjustment, else all five
    in random order; each itself applied with p=0.5 (transforms.py:236-262).
    Operates on 0..255 images (call before ``to_unit``)."""
    ops = [
        (_adjust_contrast, lambda: rng.uniform(0.8, 1.2)),
        (_adjust_gamma, lambda: rng.uniform(0.7, 1.5)),
        (_adjust_brightness, lambda: rng.uniform(0.5, 2.0)),
        (_adjust_hue, lambda: rng.uniform(-0.1, 0.1)),
        (_adjust_saturation, lambda: rng.uniform(0.8, 1.2)),
    ]
    idx = list(range(len(ops)))
    if rng.random() < 0.5:
        idx = [idx[int(rng.integers(len(idx)))]]
    else:
        rng.shuffle(idx)
    for i in idx:
        if rng.random() < 0.5:
            fn, draw = ops[i]
            param = draw()  # ONE draw — both views get identical jitter
            for k in _IMG_KEYS:
                sample[k] = fn(sample[k], param).astype(np.float32)
    return sample


# --- legacy preprocess.py transforms (inactive in the reference's trained
# config — kept for §2.10 parity; see dataloader/preprocess.py:85 where
# Lighting is commented out of the assembled pipeline) ------------------------

# AlexNet-style ImageNet PCA statistics (preprocess.py:22-29)
IMAGENET_PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
IMAGENET_PCA_EIGVEC = np.array(
    [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.8140],
        [-0.5836, -0.6948, 0.4203],
    ],
    np.float32,
)


def lighting(
    sample: dict, rng: np.random.Generator, alphastd: float = 0.1,
    eigval: np.ndarray = IMAGENET_PCA_EIGVAL,
    eigvec: np.ndarray = IMAGENET_PCA_EIGVEC,
) -> dict:
    """AlexNet PCA lighting noise (preprocess.py:129-148): add
    ``eigvec @ (alpha * eigval)`` per channel, one alpha draw shared by
    both views.  Operates on whatever scale the images are in (the
    reference applied it on 0..1 tensors)."""
    if alphastd == 0:
        return sample
    alpha = rng.normal(0, alphastd, size=3).astype(np.float32)
    rgb = (eigvec * alpha[None, :] * eigval[None, :]).sum(axis=1)
    for k in _IMG_KEYS:
        sample[k] = sample[k] + rgb
    return sample


def random_rescale(sample: dict, output_size: tuple[int, int]) -> dict:
    """Resize both views to ``output_size`` with bilinear interpolation
    (preprocess.py:221-254).  Faithful to the reference: ``gt_disp`` is
    only cast to float32, *not* resized and *not* value-rescaled — a
    quirk of the (inactive) upstream code, reproduced as-is."""
    def _resize(img: np.ndarray) -> np.ndarray:
        H, W = img.shape[:2]
        oh, ow = output_size
        # bilinear via two 1-D interpolation passes (skimage-free);
        # skimage.transform.resize uses half-pixel centres
        ys = (np.arange(oh, dtype=np.float64) + 0.5) * H / oh - 0.5
        xs = (np.arange(ow, dtype=np.float64) + 0.5) * W / ow - 0.5
        ys, xs = np.clip(ys, 0, H - 1), np.clip(xs, 0, W - 1)
        y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
        y1 = np.clip(y0 + 1, 0, H - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
        x1 = np.clip(x0 + 1, 0, W - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        img = img.astype(np.float64)
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
        bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
        return (top * (1 - wy) + bot * wy).astype(np.float32)

    for k in _IMG_KEYS:
        sample[k] = _resize(sample[k])
    if sample.get("gt_disp") is not None:
        sample["gt_disp"] = sample["gt_disp"].astype(np.float32)
    return sample


def train_transform(
    sample: dict, rng: np.random.Generator,
    crop=(320, 640), color: bool = False,
) -> dict:
    """The trainer's train pipeline: RandomCrop + ÷255 + Normalize
    (trainer_DLC_GRU.py:59-64); optional photometric jitter first.

    When the native IO library is built, the three image passes
    (crop-copy, ÷255, normalize) run as ONE fused pass per image
    (``native.crop_normalize``) — same samples bit-for-float-ulp (the
    offsets come from the same RNG draws in the same order;
    parity-tested in tests/test_native.py).  Measured on the 4-core
    bench host: per-worker sample cost 40 → ~31 ms (BENCHMARKS "input
    pipeline")."""
    if color:
        sample = random_color(sample, rng)
    height, width = crop
    H, W = sample["img_left"].shape[:2]
    if H >= height and W >= width:
        from . import native

        if native.available():
            # same draw order as random_crop (ox then oy)
            ox = int(rng.integers(0, W - width + 1))
            oy = int(rng.integers(0, H - height + 1))
            for k in _IMG_KEYS:
                sample[k] = native.crop_normalize(
                    sample[k], oy, ox, height, width,
                    IMAGENET_MEAN, IMAGENET_STD,
                )
            for k in _DENSE_KEYS[2:]:
                if k in sample and sample[k] is not None:
                    sample[k] = sample[k][oy : oy + height, ox : ox + width]
            return sample
    sample = random_crop(sample, height, width, rng)
    return normalize(to_unit(sample))


def val_transform(sample: dict) -> dict:
    """÷255 + Normalize (trainer_DLC_GRU.py:66-68)."""
    return normalize(to_unit(sample))
