"""Deviation loss + anomaly score network (reference loss/deviation_loss.py,
networks/backbone.py).

The reference draws 5000 N(0,1) samples per call purely to estimate
(mean=0, std=1); we use the exact constants by default (identical in
expectation, deterministic) and optionally the sampled estimate with an
explicit key for bit-level fidelity studies.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.models.backbones.resnet import ResNet, resnet_feature_dim


def deviation_loss(
    y_pred: jax.Array,
    y_true: jax.Array,
    confidence_margin: float = 5.0,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """y_pred: (B,) anomaly scores; y_true: (B,) in {0 inlier, 1 outlier}."""
    if key is not None:
        ref = jax.random.normal(key, (5000,))
        dev = (y_pred - ref.mean()) / ref.std()
    else:
        dev = y_pred
    inlier = jnp.abs(dev)
    outlier = jnp.clip(confidence_margin - dev, 0.0, None)
    y = y_true.astype(jnp.float32)
    return jnp.mean((1 - y) * inlier + y * outlier)


class AnomalyScoreNet(nn.Module):
    """Feature extractor trunk + linear deviation score head.

    This supplies the training head the reference lacks (SURVEY.md §0: no
    driver exists for the anomaly stack; the DRA-style deviation network is
    the documented intent).  backbone in {resnet18, resnet50}.
    """

    backbone: str = "resnet18"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        feats = ResNet(
            arch=self.backbone,
            frozen_bn=False,
            out_features=("res5",),
            dtype=self.dtype,
            name="features",
        )(x, train)["res5"]
        pooled = jnp.mean(feats, axis=(1, 2))  # GAP
        score = nn.Dense(1, dtype=self.dtype, name="score_head")(pooled)[..., 0]
        return score, pooled
