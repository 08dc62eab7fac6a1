"""Decoded-sample disk cache: epoch ≥2 skips PNG/PFM decode.

Multi-epoch training re-decodes every PNG every epoch — 24.8 of the
~31 ms/sample host cost at SceneFlow geometry is decode that is
IDENTICAL across a 70-epoch run (BENCHMARKS "Input pipeline"; reference
analogue: the DataLoader worker pool re-decoding per epoch,
``train_file/trainer_DLC_GRU.py:79-82``).  This cache stores the
DECODED, pre-augmentation arrays keyed by (absolute path, size,
mtime_ns), so any change to a source file invalidates its entry:

- images as uint8 [H, W, 3] — ``read_img``'s float32 output holds
  integral 0..255 values (8-bit PNG sources), so the uint8 round-trip
  is bit-exact;
- disparities as their native float32.

Writes are atomic (tmp + rename), making concurrent loader workers /
processes sharing one cache dir safe: a half-written entry is never
visible, and a lost race merely re-decodes once.  ~5.2 MB/sample at
SceneFlow geometry; opt-in via ``StereoDataset(cache_dir=...)`` /
``--data_cache`` because a full 35k-sample epoch costs ~180 GB of disk.
"""

from __future__ import annotations

import hashlib
import os
import threading
from typing import Optional

import numpy as np

from .file_io import read_disp, read_img


class DecodedSampleCache:
    """One .npy per decoded array under ``cache_dir``, content-addressed
    by source path + stat."""

    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _key(self, path: str, tag: str) -> str:
        st = os.stat(path)
        ident = (f"{os.path.abspath(path)}|{st.st_size}|"
                 f"{st.st_mtime_ns}|{tag}")
        h = hashlib.sha1(ident.encode()).hexdigest()
        return os.path.join(self.dir, h[:2], h + ".npy")

    def _get(self, path: str, tag: str, decode) -> np.ndarray:
        key = self._key(path, tag)
        try:
            return np.load(key)
        except (FileNotFoundError, ValueError, EOFError):
            pass  # miss, or a corrupt entry — re-decode and rewrite
        val = decode(path)
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.tmp.{os.getpid()}.{threading.get_ident()}"
        try:
            with open(tmp, "wb") as f:
                np.save(f, val)
            os.replace(tmp, key)
        except OSError:
            # cache dir full / read-only: serve the decode, skip caching
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return val

    def img(self, path: str) -> np.ndarray:
        """``read_img`` through the cache (float32 [H, W, 3], 0..255)."""
        u8 = self._get(path, "img_u8",
                       lambda p: read_img(p).astype(np.uint8))
        return u8.astype(np.float32)

    def disp(self, path: str, subset: bool = False) -> np.ndarray:
        """``read_disp`` through the cache (float32, native values)."""
        return self._get(path, f"disp_subset={int(subset)}",
                         lambda p: read_disp(p, subset=subset))


def open_cache(cache_dir: Optional[str]) -> Optional[DecodedSampleCache]:
    return DecodedSampleCache(cache_dir) if cache_dir else None
