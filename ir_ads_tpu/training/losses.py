"""Segmentation losses (reference semseg/losses.py:6-83).

All losses take NHWC logits (B, H, W, C) and integer labels (B, H, W); the
ignore label is masked out of both the numerator and the averaging
denominator, matching torch CrossEntropyLoss(ignore_index=...).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _label_onehot(labels: jax.Array, num_classes: int) -> jax.Array:
    """Bool (..., C) one-hot via iota compare — NO gather.  A
    take_along_axis over the class dim lowers to 1.2M scalar gathers at
    (4, 480, 640, 40) and profiled 26 ms per loss term on v5e (79 ms of a
    337 ms train step across the three MMST heads); the dense compare
    fuses into the log_softmax pass."""
    classes = jax.lax.broadcasted_iota(
        jnp.int32, (*labels.shape, num_classes), labels.ndim
    )
    return classes == labels[..., None]


def _select_label_logit(logp: jax.Array, labels: jax.Array) -> jax.Array:
    """logp[..., labels] per pixel, gather-free (see _label_onehot)."""
    onehot = _label_onehot(labels, logp.shape[-1])
    return jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    class_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean CE over non-ignored pixels (torch 'mean' reduction semantics:
    weighted sum / sum of weights)."""
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_select_label_logit(logp, safe_labels)
    if class_weights is not None:
        onehot = _label_onehot(safe_labels, logp.shape[-1])
        w = jnp.sum(
            jnp.where(onehot, class_weights.astype(jnp.float32), 0.0), -1
        )
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    total_w = jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.sum(nll * w) / total_w


def ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    thresh: float = 0.7,
    min_kept_frac: float = 1.0 / 16.0,
) -> jax.Array:
    """Online hard example mining CE (reference OhemCrossEntropy).

    Keeps pixels with loss above -log(thresh); if fewer than
    n_valid * min_kept_frac survive, keeps the top-k hardest instead.
    Static-shape version: both branches are computed and selected with
    lax.cond-free arithmetic (cheap compared to the forward pass).
    """
    valid = (labels != ignore_label).reshape(-1)
    safe_labels = jnp.where(labels != ignore_label, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_select_label_logit(logp, safe_labels)
    nll = jnp.where(labels != ignore_label, nll, 0.0).reshape(-1)

    loss_thresh = -jnp.log(jnp.asarray(thresh))
    n_min = (jnp.sum(valid) * min_kept_frac).astype(jnp.int32)

    hard = nll > loss_thresh
    n_hard = jnp.sum(hard)
    mean_hard = jnp.sum(jnp.where(hard, nll, 0.0)) / jnp.maximum(n_hard, 1)

    sorted_nll = jnp.sort(nll)[::-1]
    ranks = jnp.arange(sorted_nll.shape[0])
    topk_mean = jnp.sum(jnp.where(ranks < n_min, sorted_nll, 0.0)) / jnp.maximum(
        n_min, 1
    )
    return jnp.where(n_hard < n_min, topk_mean, mean_hard)


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    delta: float = 0.5,
) -> jax.Array:
    """Tversky/dice loss (reference Dice, losses.py:48-70).

    Note the reference applies one_hot to raw labels without masking ignore
    pixels — we mask them for correctness and document the divergence.
    """
    num_classes = logits.shape[-1]
    valid = (labels != ignore_label)[..., None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid
    onehot = jax.nn.one_hot(jnp.where(labels != ignore_label, labels, 0), num_classes) * valid
    tp = jnp.sum(onehot * probs, axis=(1, 2))
    fn = jnp.sum(onehot * (1 - probs), axis=(1, 2))
    fp = jnp.sum((1 - onehot) * probs, axis=(1, 2))
    dice = (tp + 1e-6) / (tp + delta * fn + (1 - delta) * fp + 1e-6)
    return jnp.mean(jnp.sum(1 - dice, axis=-1) / num_classes)


LOSSES = {
    "CrossEntropy": cross_entropy,
    "OhemCrossEntropy": ohem_cross_entropy,
    "Dice": dice_loss,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise ValueError(f"Unknown loss {name!r}; available: {sorted(LOSSES)}")
    return LOSSES[name]
