"""CMX backbone: MiT dual-path with FRM rectification + FFM fusion.

Reference: semseg/models/backbones/cmx.py:156-342 — separate MiT block
stacks per modality (unlike the shared-weight CMNeXt streams), FRM after
each stage's blocks, FFM producing the fused pyramid.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import numpy as np
from flax import linen as nn

from ir_ads_tpu.models.backbones.mit import MIT_SETTINGS, MixFFN, SRAttention
from ir_ads_tpu.models.modules.fusion import (
    FeatureFusionModule,
    FeatureRectifyModule,
)
from ir_ads_tpu.ops.layers import DropPath

Dtype = Any


class MiTBlock(nn.Module):
    """Plain MiT block, no adapters (reference cmx.py Block, :80-90)."""

    dim: int
    num_heads: int
    sr_ratio: int
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                        dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        )
        x = x + DropPath(self.drop_path_rate)(h, deterministic)
        h = MixFFN(self.dim * 4, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        )
        return x + DropPath(self.drop_path_rate)(h, deterministic)


class CMX(nn.Module):
    """Dual-path MiT + FRM/FFM; returns the fused 4-scale pyramid."""

    variant: str = "B2"
    drop_path_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_rgb: jax.Array, x_ext: jax.Array,
                 train: bool = False) -> List[jax.Array]:
        dims, depths = MIT_SETTINGS[self.variant]
        dpr = np.linspace(0.0, self.drop_path_rate, sum(depths))
        heads = (1, 2, 5, 8)
        srs = (8, 4, 2, 1)
        patch = ((7, 4), (3, 2), (3, 2), (3, 2))

        outs = []
        cur = 0
        for i in range(4):
            k, s = patch[i]
            x_rgb = nn.Conv(dims[i], (k, k), strides=(s, s), padding=k // 2,
                            dtype=self.dtype, name=f"patch_embed{i + 1}")(x_rgb)
            x_rgb = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"patch_norm{i + 1}")(x_rgb)
            x_ext = nn.Conv(dims[i], (k, k), strides=(s, s), padding=k // 2,
                            dtype=self.dtype,
                            name=f"extra_patch_embed{i + 1}")(x_ext)
            x_ext = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"extra_patch_norm{i + 1}")(x_ext)

            for j in range(depths[i]):
                x_rgb = MiTBlock(dims[i], heads[i], srs[i],
                                 float(dpr[cur + j]), dtype=self.dtype,
                                 name=f"block{i + 1}_{j}")(x_rgb, not train)
                x_ext = MiTBlock(dims[i], heads[i], srs[i],
                                 float(dpr[cur + j]), dtype=self.dtype,
                                 name=f"extra_block{i + 1}_{j}")(x_ext, not train)
            cur += depths[i]

            x_rgb = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm{i + 1}")(x_rgb)
            x_ext = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"extra_norm{i + 1}")(x_ext)
            x_rgb, x_ext = FeatureRectifyModule(
                dtype=self.dtype, name=f"frm_{i}"
            )(x_rgb, x_ext)
            fused = FeatureFusionModule(
                num_heads=heads[i], dtype=self.dtype, name=f"ffm_{i}"
            )(x_rgb, x_ext, train)
            outs.append(fused)
        return outs
