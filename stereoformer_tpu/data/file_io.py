"""Image / disparity file IO (numpy, no torch).

Reference semantics: ``utils/file_io.py:11-107`` — PIL RGB images as
float32 0..255; PFM disparities (little/big-endian, flipud); KITTI
16-bit PNG ÷ 256; ``.npy`` passthrough; SceneFlow *subset* disparities
are stored negative and flipped to positive.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def read_img(filename: str) -> np.ndarray:
    """RGB image as float32 [H, W, 3] in 0..255 (file_io.py:11-14).

    PNGs decode through the native library when built (lean zlib
    inflate + unfilter — measured 1.5× PIL on SceneFlow-size images,
    BENCHMARKS "input pipeline"; byte-parity-tested); palette/16-bit/
    interlaced PNGs and other formats fall back to PIL."""
    if filename.lower().endswith(".png"):
        from . import native

        if native.available():
            img = native.read_png_rgb(filename)
            if img is not None:
                return img
    from PIL import Image

    return np.array(Image.open(filename).convert("RGB"), dtype=np.float32)


def read_pfm(filename: str) -> tuple[np.ndarray, float]:
    """PFM reader (file_io.py:34-69): returns (flipud'd data, scale)."""
    with open(filename, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{filename}: not a PFM file")
        dim_line = f.readline().decode("ascii")
        m = re.match(r"^(\d+)\s(\d+)\s$", dim_line)
        if not m:
            raise ValueError(f"{filename}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).copy(), scale


def write_pfm(filename: str, data: np.ndarray, scale: float = 1.0) -> None:
    """PFM writer (dataloader/preprocess.py:421-457 semantics)."""
    data = np.asarray(data, np.float32)
    color = data.ndim == 3 and data.shape[2] == 3
    if data.ndim not in (2, 3):
        raise ValueError("PFM data must be HxW or HxWx3")
    endian = data.dtype.byteorder
    little = endian == "<" or (endian == "=" and np.little_endian)
    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-scale if little else scale}\n".encode())
        np.flipud(data).tofile(f)


def _read_kitti_disp(filename: str) -> np.ndarray:
    from . import native

    if native.available():
        # 16-bit gray decode in the native library (parity-tested)
        arr = native.read_png_gray16(filename)
        if arr is not None:
            return arr.astype(np.float32) / 256.0
    from PIL import Image

    return (np.array(Image.open(filename), dtype=np.float32)) / 256.0


def read_disp(filename: str, subset: bool = False) -> np.ndarray:
    """Disparity map [H, W] float32 (file_io.py:17-31).  PFM decode uses
    the native library (native/libstereoformer_io.so) when built."""
    suffix = Path(filename).suffix.lower()
    if suffix == ".pfm":
        from . import native

        if native.available():
            disp = native.read_pfm(filename)
        else:
            disp = np.ascontiguousarray(read_pfm(filename)[0])
        if subset:
            disp = -disp
    elif suffix == ".png":
        disp = _read_kitti_disp(filename)
    elif suffix == ".npy":
        disp = np.load(filename)
    else:
        raise ValueError(f"invalid disparity file format: {filename}")
    return disp.astype(np.float32)


def read_text_lines(filepath: str) -> list[str]:
    """Non-empty stripped lines (utils/utils.py read_text_lines)."""
    with open(filepath) as f:
        return [l.strip() for l in f if l.strip()]
