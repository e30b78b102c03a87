"""Decode-once raw-sample cache (VERDICT r1 item 9).

JPEG/PNG decode costs ~54 ms/sample on this host — on a small-core host
that alone caps a real-decode loader far below the device rate.  The
production fix (same role as grain/array_record pre-materialisation on TPU
pods) is to decode each sample ONCE into flat uint8 memmaps and serve
training/eval from page-cached memory: a cached fetch is a memcpy, not a
decode.

Layout under ``cache_dir``: one ``<modality>.npy`` memmap of shape
(N, H, W, C) uint8 per modality plus ``mask.npy`` (N, H, W) uint8/int32 and
a ``meta.json``.  Requires uniform per-sample shapes (true for the eval
pipelines; train pipelines cache the *decoded* images and still run the
random augmentations per epoch).

Usage:
    ds = NYU(root, "val", transform, ["img", "depth"])
    cached = RawCache.build(ds, "/tmp/nyu_val_cache", transform=transform)
    # later / other process:
    cached = RawCache.open("/tmp/nyu_val_cache", transform=transform)
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np


class RawCache:
    """Materialized decoded samples; indexable like the source dataset."""

    def __init__(self, cache_dir: str, transform: Optional[Callable] = None):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.cache_dir = cache_dir
        self.transform = transform
        self.modals: List[str] = self.meta["modals"]
        self.n = self.meta["n"]
        self._arrays: Dict[str, np.ndarray] = {
            name: np.load(
                os.path.join(cache_dir, f"{name}.npy"), mmap_mode="r"
            )
            for name in self.modals + ["mask"]
        }

    # -- construction ------------------------------------------------------
    @classmethod
    def build(
        cls,
        dataset,
        cache_dir: str,
        transform: Optional[Callable] = None,
        force: bool = False,
    ) -> "RawCache":
        """Decode every raw (pre-transform) sample of ``dataset`` into
        memmaps.  ``dataset`` must expose ``load_raw(i) -> (sample_dict,
        mask)`` or be iterable with transform=None semantics."""
        meta_path = os.path.join(cache_dir, "meta.json")
        if os.path.exists(meta_path) and not force:
            return cls.open(cache_dir, transform)
        os.makedirs(cache_dir, exist_ok=True)
        n = len(dataset)
        writers: Dict[str, np.lib.format.open_memmap] = {}
        for i in range(n):
            sample, mask = _raw_item(dataset, i)
            sample = dict(sample)
            sample["mask"] = mask
            for name, arr in sample.items():
                if name not in writers:
                    dt = np.uint8 if (
                        arr.dtype == np.uint8
                        or (arr.min() >= 0 and arr.max() <= 255)
                    ) else np.int32
                    writers[name] = np.lib.format.open_memmap(
                        os.path.join(cache_dir, f"{name}.npy"),
                        mode="w+",
                        dtype=dt,
                        shape=(n, *arr.shape),
                    )
                writers[name][i] = arr
        for w in writers.values():
            w.flush()
        modals = [m for m in writers if m != "mask"]
        if hasattr(dataset, "modals"):
            modals = list(dataset.modals)
        with open(meta_path, "w") as f:
            json.dump({"n": n, "modals": modals}, f)
        return cls(cache_dir, transform)

    @classmethod
    def open(
        cls, cache_dir: str, transform: Optional[Callable] = None
    ) -> "RawCache":
        return cls(cache_dir, transform)

    # -- dataset protocol --------------------------------------------------
    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        sample = {
            m: np.asarray(self._arrays[m][i]) for m in self.modals
        }
        sample["mask"] = np.asarray(self._arrays["mask"][i])
        if self.transform is not None:
            rng = np.random.default_rng(abs(hash((i, "cache"))) % (2**31))
            sample = self.transform(sample, rng)
        mask = sample.pop("mask")
        return sample, np.asarray(mask)


def _raw_item(dataset, i: int):
    """Fetch sample i with transforms disabled."""
    if hasattr(dataset, "load_raw"):
        return dataset.load_raw(i)
    saved = getattr(dataset, "transform", None)
    try:
        dataset.transform = None
        return dataset[i]
    finally:
        dataset.transform = saved
