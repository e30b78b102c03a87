"""SegFormer all-MLP decode head (reference semseg/models/heads/segformer.py).

Per-scale linear projection → bilinear upsample to the 1/4-scale grid →
1x1-conv fuse (BN+ReLU) → dropout → 1x1 class prediction.  NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.layers import resize_bilinear, trunc_normal_init


class SegFormerHead(nn.Module):
    embed_dim: int = 256
    num_classes: int = 19
    drop: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        features: Sequence[jax.Array],
        train: bool = False,
    ) -> jax.Array:
        h, w = features[0].shape[1], features[0].shape[2]
        outs = []
        for i, feat in enumerate(features):
            proj = nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(),
                dtype=self.dtype,
                name=f"linear_c{i + 1}",
            )(feat)
            if i > 0:
                proj = resize_bilinear(proj, (h, w), align_corners=False)
            outs.append(proj)

        # reference concatenates high-to-low resolution reversed (c4..c1)
        x = jnp.concatenate(outs[::-1], axis=-1)
        x = nn.Conv(
            self.embed_dim,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="linear_fuse",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="fuse_bn",
        )(x)
        x = nn.relu(x)
        if train and self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=False)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="linear_pred")(
            x
        )
        return x
