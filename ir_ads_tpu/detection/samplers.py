"""Data samplers (reference detectron2/data/samplers/distributed_sampler.py:
TrainingSampler infinite shard-aware stream, RepeatFactorTrainingSampler,
InferenceSampler) and aspect-ratio grouping (d2 build.py).

Process-sharding for multi-host input pipelines comes from
(jax.process_index(), jax.process_count()) instead of torch.distributed
ranks.
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def training_sampler(
    size: int,
    shuffle: bool = True,
    seed: int = 0,
    shard_idx: Optional[int] = None,
    num_shards: Optional[int] = None,
) -> Iterator[int]:
    """Infinite shard-aware index stream (TrainingSampler:15-71)."""
    if shard_idx is None:
        try:
            import jax

            shard_idx = jax.process_index()
            num_shards = jax.process_count()
        except Exception:
            shard_idx, num_shards = 0, 1
    epoch = 0
    while True:
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(size) if shuffle else np.arange(size)
        yield from order[shard_idx::num_shards].tolist()
        epoch += 1


def repeat_factors_from_category_frequency(
    annotations_per_image: Sequence[Sequence[int]],
    num_images: int,
    repeat_thresh: float = 0.001,
) -> np.ndarray:
    """Per-image repeat factors (RepeatFactorTrainingSampler formula):
    r(c) = max(1, sqrt(t / f(c))), r(img) = max over its categories."""
    freq: Dict[int, float] = {}
    for cats in annotations_per_image:
        for c in set(cats):
            freq[c] = freq.get(c, 0) + 1
    freq = {c: n / num_images for c, n in freq.items()}
    rep = {
        c: max(1.0, math.sqrt(repeat_thresh / f)) for c, f in freq.items()
    }
    factors = np.ones(len(annotations_per_image))
    for i, cats in enumerate(annotations_per_image):
        if cats:
            factors[i] = max(rep[c] for c in set(cats))
    return factors


def repeat_factor_sampler(
    repeat_factors: np.ndarray,
    shuffle: bool = True,
    seed: int = 0,
) -> Iterator[int]:
    """Infinite stream with stochastic fractional repeats."""
    base = np.floor(repeat_factors).astype(int)
    frac = repeat_factors - base
    epoch = 0
    while True:
        rng = np.random.default_rng(seed + epoch)
        rounds = base + (rng.random(len(base)) < frac)
        idx = np.repeat(np.arange(len(base)), rounds)
        if shuffle:
            rng.shuffle(idx)
        yield from idx.tolist()
        epoch += 1


def inference_sampler(size: int, shard_idx: int = 0, num_shards: int = 1):
    """Deterministic contiguous sharding for eval (InferenceSampler:245)."""
    per = -(-size // num_shards)
    start = shard_idx * per
    return iter(range(start, min(start + per, size)))


def aspect_ratio_group_stream(
    indices: Iterator[int],
    aspect_wide: Sequence[bool],
    batch_size: int,
) -> Iterator[List[int]]:
    """Group batches by w>h vs h>=w (d2 AspectRatioGroupedDataset) so
    padded batch shapes stay consistent."""
    buckets: Dict[bool, List[int]] = {True: [], False: []}
    for i in indices:
        b = buckets[bool(aspect_wide[i])]
        b.append(i)
        if len(b) == batch_size:
            yield list(b)
            b.clear()
