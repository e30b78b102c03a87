"""ResNet backbone family (NHWC, flax) — serves two reference roles:

  * ResNet-18 feature extractor for the anomaly stack
    (reference networks/resnet18.py:5-19, networks/backbone.py:4-13)
  * ResNet-50 with frozen BatchNorm for the DINO detection stack
    (reference detectron2 modeling/backbone/resnet.py, FrozenBN per
    projects/.../configs/models/dino_r50.py)

``frozen_bn=True`` treats BN as a fixed affine transform (inference
statistics), the d2 FrozenBatchNorm2d semantics — on TPU this folds into the
adjacent conv at compile time.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BNorm(nn.Module):
    """BatchNorm that can act frozen (affine-only, running stats)."""

    frozen: bool = True
    momentum: float = 0.9
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=self.frozen or not train,
            momentum=self.momentum,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    frozen_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="bn1")(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="bn2")(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BNorm(self.frozen_bn, dtype=self.dtype,
                             name="downsample_bn")(identity, train)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    frozen_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        identity = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="bn1")(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="bn2")(h, train)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="bn3")(h, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BNorm(self.frozen_bn, dtype=self.dtype,
                             name="downsample_bn")(identity, train)
        return nn.relu(h + identity)


ARCHS = {
    # name: (block, layers, widths)
    "resnet18": (BasicBlock, (2, 2, 2, 2), (64, 128, 256, 512)),
    "resnet34": (BasicBlock, (3, 4, 6, 3), (64, 128, 256, 512)),
    "resnet50": (Bottleneck, (3, 4, 6, 3), (64, 128, 256, 512)),
    "resnet101": (Bottleneck, (3, 4, 23, 3), (64, 128, 256, 512)),
}


class ResNet(nn.Module):
    """Returns a dict of pyramid features {res2, res3, res4, res5}."""

    arch: str = "resnet50"
    frozen_bn: bool = True
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        block_cls, layers, widths = ARCHS[self.arch]
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="stem_bn")(h, train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = {}
        for i, (n_blocks, width) in enumerate(zip(layers, widths)):
            stride = 1 if i == 0 else 2
            for j in range(n_blocks):
                h = block_cls(
                    width,
                    stride=stride if j == 0 else 1,
                    frozen_bn=self.frozen_bn,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(h, train)
            name = f"res{i + 2}"
            if name in self.out_features:
                outs[name] = h
        return outs


def resnet_feature_dim(arch: str) -> int:
    block_cls, _, widths = ARCHS[arch]
    mult = 4 if block_cls is Bottleneck else 1
    return widths[-1] * mult
