"""Host-side multimodal augmentation pipeline (numpy + PIL).

Mirrors the reference's dict-of-modalities transforms
(semseg/augmentations_mm.py): photometric ops touch only the 'img' (RGB)
modality; geometric ops apply to every modality + mask; Normalize gives RGB
the ImageNet statistics and other modalities a plain /255
(augmentations_mm.py:26-43).

Samples are dicts: modality name -> HWC uint8 ndarray, plus 'mask' -> HW
int ndarray.  Augmentation happens on host (CPU) in the input pipeline;
the accelerator only ever sees fixed-shape normalized batches.

Randomness is drawn from a per-sample ``numpy.random.Generator`` passed
through the pipeline — no global RNG state (reference uses `random.random`).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

Sample = Dict[str, np.ndarray]

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _resize(
    arr: np.ndarray,
    size: Tuple[int, int],
    nearest: bool,
    box: Optional[Tuple[float, float, float, float]] = None,
) -> np.ndarray:
    """PIL resize; size = (H, W). Handles HWC uint8 and HW int arrays.

    ``box`` resamples only that source region (PIL resize(box=...)) — used
    by RandomResizedCrop to fuse resize+crop into one pass."""
    h, w = size
    if box is None and arr.shape[:2] == (h, w):
        return arr  # already at target size (eval at native resolution)
    if arr.ndim == 2:
        # label maps: uint8 "L" NEAREST is ~9x faster than int32 "I" and
        # selects identical source pixels (same geometry, narrower dtype)
        if arr.min() >= 0 and arr.max() <= 255:
            im = Image.fromarray(arr.astype(np.uint8), mode="L")
        else:
            im = Image.fromarray(arr.astype(np.int32), mode="I")
        out = im.resize((w, h), Image.NEAREST, box=box)
        return np.asarray(out).astype(arr.dtype)
    mode = Image.NEAREST if nearest else Image.BILINEAR
    if arr.dtype == np.uint8 and arr.shape[-1] == 3:
        # one RGB resize: ~3x faster than per-channel and numerically
        # identical (PIL resamples channels independently either way)
        return np.asarray(Image.fromarray(arr).resize((w, h), mode, box=box))
    chans = [
        np.asarray(Image.fromarray(arr[..., c]).resize((w, h), mode, box=box))
        for c in range(arr.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def resize_sample(sample: Sample, size: Tuple[int, int]) -> Sample:
    return {
        k: _resize(v, size, nearest=(k == "mask")) for k, v in sample.items()
    }


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Sample, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class Resize:
    """Scale so min side == size[0], then align both sides up to /32
    (reference Resize, augmentations_mm.py:279-311)."""

    def __init__(self, size: Sequence[int]):
        self.size = size

    def __call__(self, sample: Sample, rng) -> Sample:
        h, w = sample["img"].shape[:2]
        scale = self.size[0] / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        sample = resize_sample(sample, (nh, nw))
        ah, aw = math.ceil(nh / 32) * 32, math.ceil(nw / 32) * 32
        if (ah, aw) != (nh, nw):
            sample = resize_sample(sample, (ah, aw))
        return sample


class RandomResizedCrop:
    """Random scale in [lo, hi], resize, random crop, bottom-right pad
    (reference RandomResizedCrop, augmentations_mm.py:314-363)."""

    def __init__(self, size, scale=(0.5, 2.0), seg_fill=255):
        self.size = tuple(size)
        self.scale = scale
        self.seg_fill = seg_fill

    def __call__(self, sample: Sample, rng) -> Sample:
        h, w = sample["img"].shape[:2]
        th, tw = self.size
        ratio = rng.random() * (self.scale[1] - self.scale[0]) + self.scale[0]
        scale = (int(th * ratio), int(tw * 4 * ratio))
        factor = min(max(scale) / max(h, w), min(scale) / min(h, w))
        nh, nw = int(h * factor + 0.5), int(w * factor + 0.5)

        margin_h, margin_w = max(nh - th, 0), max(nw - tw, 0)
        y1 = int(rng.integers(0, margin_h + 1))
        x1 = int(rng.integers(0, margin_w + 1))
        # fused resize+crop: resample ONLY the crop window via PIL's
        # resize(box=...).  box-space coords map output pixel j to source
        # (x1+j+0.5)*w/nw — the same grid resize-then-slice uses, so this
        # is the identical augmentation up to PIL's internal per-region
        # rounding (<=2/255 bilinear, <2.5% nearest boundary pixels) at a
        # fraction of the cost (resamples th*tw pixels, not nh*nw).
        ch, cw = min(th, nh - y1), min(tw, nw - x1)
        box = (x1 * w / nw, y1 * h / nh, (x1 + cw) * w / nw, (y1 + ch) * h / nh)
        sample = {
            k: _resize(v, (ch, cw), nearest=(k == "mask"), box=box)
            for k, v in sample.items()
        }
        if (ch, cw) != (th, tw):
            pads = ((0, th - ch), (0, tw - cw))
            out = {}
            for k, v in sample.items():
                fill = self.seg_fill if k == "mask" else 0
                cfg = pads if v.ndim == 2 else pads + ((0, 0),)
                out[k] = np.pad(v, cfg, constant_values=fill)
            sample = out
        return sample


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample: Sample, rng) -> Sample:
        if rng.random() < self.p:
            return {
                k: (v[:, ::-1] if v.ndim == 2 else v[:, ::-1, :]).copy()
                for k, v in sample.items()
            }
        return sample


def _to_gray(img: np.ndarray) -> np.ndarray:
    return (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.float32)


def _blend(a: np.ndarray, b: np.ndarray, ratio: float) -> np.ndarray:
    return np.clip(ratio * a + (1.0 - ratio) * b, 0, 255).astype(np.uint8)


class RandomColorJitter:
    """Brightness/contrast/saturation each uniform in [0.5, 1.5] when fired
    (reference RandomColorJitter, augmentations_mm.py:46-58)."""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample: Sample, rng) -> Sample:
        if rng.random() >= self.p:
            return sample
        img = sample["img"].astype(np.float32)
        b = np.float32(rng.uniform(0.5, 1.5))
        img = np.clip(img * b, 0, 255)
        c = np.float32(rng.uniform(0.5, 1.5))
        # float32 scalar: a float64 mean would silently upcast the whole
        # image to float64 (measured ~10x slower through the pipeline)
        mean_gray = np.float32(_to_gray(img).mean())
        img = np.clip(c * img + (1 - c) * mean_gray, 0, 255)
        s = np.float32(rng.uniform(0.5, 1.5))
        gray = _to_gray(img)[..., None]
        img = np.clip(s * img + (1 - s) * gray, 0, 255)
        sample = dict(sample)
        sample["img"] = img.astype(np.uint8)
        return sample


class RandomGaussianBlur:
    def __init__(self, kernel_size=3, p=0.5):
        self.k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.p = p
        sigma = 0.3 * ((self.k - 1) * 0.5 - 1) + 0.8
        xs = np.arange(self.k) - (self.k - 1) / 2.0
        kern = np.exp(-(xs**2) / (2 * sigma**2))
        self.kern = (kern / kern.sum()).astype(np.float32)

    def __call__(self, sample: Sample, rng) -> Sample:
        if rng.random() >= self.p:
            return sample
        # separable tap-sum with numpy slicing (reflect == scipy 'mirror' ==
        # torch 'reflect'): ~11x faster than scipy convolve1d on this
        # workload, equal to +-1/255 (float summation order)
        img = sample["img"].astype(np.float32)
        r = self.k // 2
        p = np.pad(img, ((r, r), (0, 0), (0, 0)), mode="reflect")
        img = sum(
            self.kern[t] * p[t : t + img.shape[0]] for t in range(self.k)
        )
        p = np.pad(img, ((0, 0), (r, r), (0, 0)), mode="reflect")
        img = sum(
            self.kern[t] * p[:, t : t + img.shape[1]] for t in range(self.k)
        )
        sample = dict(sample)
        sample["img"] = np.clip(img, 0, 255).astype(np.uint8)
        return sample


class Normalize:
    """img -> /255 + ImageNet norm; other modalities -> /255; mask untouched."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample: Sample, rng=None) -> Sample:
        out = {}
        for k, v in sample.items():
            if k == "mask":
                out[k] = v
            elif k == "img":
                out[k] = (v.astype(np.float32) / 255.0 - self.mean) / self.std
            else:
                out[k] = v.astype(np.float32) / 255.0
        return out


def get_train_augmentation(size: Sequence[int], seg_fill: int = 255) -> Compose:
    """Training pipeline (reference augmentations_mm.py:365-372)."""
    return Compose(
        [
            RandomColorJitter(p=0.2),
            RandomHorizontalFlip(p=0.5),
            RandomGaussianBlur(3, p=0.2),
            RandomResizedCrop(size, scale=(0.5, 2.0), seg_fill=seg_fill),
            Normalize(),
        ]
    )


def get_val_augmentation(size: Sequence[int]) -> Compose:
    return Compose([Resize(size), Normalize()])


def get_val_augmentation_device_norm(size: Sequence[int]) -> Compose:
    """Val pipeline WITHOUT host Normalize: batches stay uint8 (4x fewer
    host->device bytes) and ``device_normalize`` runs inside the jitted
    forward.  Numerics identical to Resize+Normalize."""
    return Compose([Resize(size)])


def device_normalize(x, modal: str = "img"):
    """In-graph equivalent of Normalize for a uint8/float batch (B,H,W,C):
    'img' gets /255 + ImageNet statistics, other modalities plain /255."""
    import jax.numpy as jnp

    x = x.astype(jnp.float32) / 255.0
    if modal == "img":
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x
