"""Streaming segmentation metrics (reference semseg/metrics.py:45-106).

The reference accumulates per-class tp/fp/fn with a python loop over classes
on device — O(num_classes) kernel launches per batch.  Here the whole update
is one confusion-matrix bincount (a single scatter-add), jit-compiled, and
the per-class stats fall out of the matrix.  Device-resident accumulation:
the (C, C) matrix lives on device across batches; only the final compute
pulls scalars to host.

The reference's val_mm.py:80-82 quirk (acc & f1 reported as IoU) is NOT
replicated — we compute the real statistics and document the divergence.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(2,))
def update_confusion(
    pred: jax.Array,  # (B, H, W) int class predictions
    label: jax.Array,  # (B, H, W) int labels (may contain ignore)
    hist: jax.Array,  # (C, C) running confusion matrix
    ignore_label: int,
) -> jax.Array:
    c = hist.shape[0]
    valid = label != ignore_label
    idx = jnp.where(valid, label * c + pred, c * c)  # OOB bucket for ignored
    counts = jnp.bincount(idx.reshape(-1), length=c * c + 1)[: c * c]
    return hist + counts.reshape(c, c).astype(hist.dtype)


class Metrics:
    """Streaming IoU / F1 / pixel-accuracy over a (C, C) confusion matrix."""

    def __init__(self, num_classes: int, ignore_label: int = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.hist = jnp.zeros((num_classes, num_classes), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    def update(self, pred_or_logits: jax.Array, label: jax.Array) -> None:
        """pred_or_logits: (B,H,W) class ids or (B,H,W,C) logits/probs."""
        if pred_or_logits.ndim == label.ndim + 1:
            pred = jnp.argmax(pred_or_logits, axis=-1)
        else:
            pred = pred_or_logits
        self.hist = update_confusion(
            pred.astype(jnp.int32),
            label.astype(jnp.int32),
            self.hist,
            self.ignore_label,
        )

    def reset(self) -> None:
        self.hist = jnp.zeros_like(self.hist)

    def _stats(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        hist = np.asarray(self.hist, dtype=np.float64)
        tp = np.diag(hist)
        fp = hist.sum(0) - tp
        fn = hist.sum(1) - tp
        return tp, fp, fn

    def compute_iou(self) -> Tuple[List[float], float]:
        tp, fp, fn = self._stats()
        iou = tp / np.maximum(tp + fp + fn, 1e-8)
        return iou.tolist(), round(float(iou.mean()) * 100, 2)

    def compute_f1(self) -> Tuple[List[float], float]:
        tp, fp, fn = self._stats()
        f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1e-8)
        return (f1 * 100).round(2).tolist(), round(float(f1.mean()) * 100, 2)

    def compute_pixel_acc(self) -> Tuple[List[float], float]:
        tp, fp, fn = self._stats()
        acc = tp / np.maximum(tp + fn, 1e-8)
        return (acc * 100).round(2).tolist(), round(float(acc.mean()) * 100, 2)
