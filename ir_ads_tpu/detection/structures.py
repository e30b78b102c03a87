"""Detection data structures (reference detectron2/structures: Boxes,
Instances, ImageList, BitMasks).

JAX is array-first, so these are thin, static-shape conventions rather than
the reference's mutable OO wrappers:

  * ``Instances``: a NamedTuple of parallel arrays with an explicit
    ``valid`` mask replacing dynamic-length Instances.
  * ``image_list_from``: pad a list of HWC images to one (B, H, W, C)
    batch + per-image sizes — the ImageList contract.
  * Box containers are plain (N, 4) arrays; formats documented per function
    in box_ops.py (xyxy / cxcywh / COCO xywh).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np


class Instances(NamedTuple):
    """Fixed-capacity instance set (pad to max_instances, mask validity)."""

    boxes: np.ndarray  # (N, 4) xyxy absolute
    labels: np.ndarray  # (N,)
    scores: np.ndarray  # (N,)
    valid: np.ndarray  # (N,) bool
    masks: Optional[np.ndarray] = None  # (N, H, W)

    def __len__(self) -> int:
        return int(self.valid.sum())

    def compact(self) -> "Instances":
        """Drop padded slots (host-side only)."""
        v = self.valid
        return Instances(
            self.boxes[v], self.labels[v], self.scores[v],
            np.ones(int(v.sum()), bool),
            None if self.masks is None else self.masks[v],
        )


def instances_from_arrays(
    boxes, labels, scores, max_instances: int, masks=None
) -> Instances:
    n = len(boxes)
    k = min(n, max_instances)
    out_boxes = np.zeros((max_instances, 4), np.float32)
    out_labels = np.zeros((max_instances,), np.int32)
    out_scores = np.zeros((max_instances,), np.float32)
    valid = np.zeros((max_instances,), bool)
    out_boxes[:k] = boxes[:k]
    out_labels[:k] = labels[:k]
    out_scores[:k] = scores[:k]
    valid[:k] = True
    out_masks = None
    if masks is not None:
        out_masks = np.zeros((max_instances,) + masks.shape[1:], masks.dtype)
        out_masks[:k] = masks[:k]
    return Instances(out_boxes, out_labels, out_scores, valid, out_masks)


def image_list_from(
    images: Sequence[np.ndarray], size_divisibility: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad HWC images to a common /divisible size (d2 ImageList.from_tensors).

    Returns (batch (B, H, W, C), sizes (B, 2) original (h, w))."""
    sizes = np.asarray([im.shape[:2] for im in images])
    h = int(np.max(sizes[:, 0]))
    w = int(np.max(sizes[:, 1]))
    d = size_divisibility
    h = -(-h // d) * d
    w = -(-w // d) * d
    c = images[0].shape[2]
    batch = np.zeros((len(images), h, w, c), images[0].dtype)
    for i, im in enumerate(images):
        batch[i, : im.shape[0], : im.shape[1]] = im
    return batch, sizes
